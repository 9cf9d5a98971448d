package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch-prefiltered exact heavy hitters.
  *
  * "Every key with count ≥ T" normally needs a full groupBy over all
  * keys — at 100 TB that shuffle is dominated by the long tail of
  * near-singleton keys that can never reach T. A count-min sketch
  * turns that upside down:
  *
  *   1. build a CMS over the key column — one distributed merge
  *      aggregation (`DataFrameStatFunctions.countMinSketch`), fixed
  *      size (depth × width counters) regardless of key cardinality;
  *   2. probe the broadcast sketch per distinct key: CMS estimates
  *      NEVER undercount, so `estimate < T` proves `true count < T` —
  *      the tail exits without ever being counted exactly;
  *   3. exactly count ONLY the surviving candidates (a broadcast semi
  *      filter before the groupBy) and apply the threshold to remove
  *      the sketch's false positives.
  *
  * The result is therefore EXACTLY `GROUP BY key HAVING count ≥ T` at
  * every sketch size — the sketch only routes, it never decides — same
  * verifiability contract as [[BloomDedup]]. The probe is a broadcast
  * bitset/counter lookup (the second deliberate Scala-UDF; everything
  * else is builtin Catalyst).
  *
  * Reference scope: the streamer counts nothing (SURVEY §2.5); this is
  * E8-family extension surface with an exactness guarantee the plain
  * sketch lacks.
  */
object HeavyHitters {

  /** Keys of `df.keyCol` with exact occurrence count ≥ threshold.
    *
    * @param eps        relative error of the sketch (width = ceil(2/eps)):
    *                   smaller = fewer false-positive candidates, more
    *                   sketch memory
    * @param confidence probability the error bound holds per key
    */
  def atLeast(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    // Null keys never enter the sketch and a null probe returns null,
    // which would silently drop a frequent null key that SQL GROUP BY
    // does count — so nulls bypass the sketch and are counted exactly
    // (they are one group; the exact count costs one aggregate row).
    val spark = df.sparkSession
    val nonNull = df.filter(col(keyCol).isNotNull)
    val cms: CountMinSketch =
      nonNull.stat.countMinSketch(keyCol, eps, confidence, seed)
    val cmsB = spark.sparkContext.broadcast(cms)
    // The probe MUST hash through the same code path the sketch-build
    // used for this column type: stat.countMinSketch adds strings as
    // UTF-8 bytes but integral columns via addLong, and
    // estimateCount(Object) dispatches on the runtime class — probing
    // a long-built sketch with a stringified key would hash "123"
    // instead of 123L, estimate ~0 for every true heavy key, and the
    // candidate filter would silently drop them (breaking the
    // no-undercount proof step 2 rests on). Unsupported key types fail
    // loudly instead.
    import org.apache.spark.sql.types._
    val probe = df.schema(keyCol).dataType match {
      case StringType =>
        udf((k: String) => cmsB.value.estimateCount(k)).apply(col(keyCol))
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => cmsB.value.estimateCount(k))
          .apply(col(keyCol).cast("long"))
      case other => throw new IllegalArgumentException(
        s"HeavyHitters.atLeast: unsupported key type ${other.catalogString} " +
          "(countMinSketch supports string and integral keys)")
    }
    val candidates = nonNull.select(col(keyCol)).distinct()
      .filter(probe >= threshold)
    val hot = nonNull.join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
    val nullHot = df.filter(col(keyCol).isNull)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
    hot.unionByName(nullHot)
  }
}
