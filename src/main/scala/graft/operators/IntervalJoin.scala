package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (bounded-time-distance) join: pairs of same-key rows with
  * `|left.ts - right.ts| <= delta`.
  *
  * Spark plans the naive form (`l.key = r.key AND abs(l.ts - r.ts) <=
  * d`) as an equi-join on the key with the range as a post-condition —
  * fine when keys are selective, catastrophic when a hot key holds
  * millions of rows (the per-key pair space is quadratic). This
  * operator makes the time bound part of the SHUFFLE KEY via time
  * binning:
  *
  *   - right rows land in bin `floor(ts / delta)` (one copy);
  *   - left rows probe bins `{b-1, b, b+1}` (three copies, via a
  *     3-element explode);
  *   - equi-join on (key, bin), then the exact `abs(...) <= delta`
  *     residual filter.
  *
  * Any qualifying pair differs by <= delta, so the right row's bin is
  * within ±1 of the left row's — every true pair meets in exactly one
  * bin (the right row's), no pair dedup needed. Cost: 3× replication
  * of the left side vs. a pair space bounded by bin occupancy instead
  * of key cardinality — at 100 TB the shuffle stays hash-partitioned
  * on (key, bin) and AQE sees ordinary equi-join statistics (skew
  * split works; a BNLJ would be unsplittable).
  *
  * Pass the SMALLER side as `left` (it carries the 3× replication).
  */
object IntervalJoin {

  /** @param deltaUs bound on |lTs - rTs|, microseconds (inclusive)
    * @param rightPrefix prefix for right payload columns (all right
    *                    columns except the key)
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      deltaUs: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(deltaUs > 0, "deltaUs must be positive")
    val rightPayload = right.columns.toSeq.filterNot(_ == keyCol)

    def binOf(ts: org.apache.spark.sql.Column) =
      floor(unix_micros(ts) / lit(deltaUs))

    val r = right.select(
      right(keyCol).as("__k"),
      binOf(right(rightTsCol)).as("__bin"),
      struct(rightPayload.map(right(_)): _*).as("__r"))

    // Generators must be top-level in a projection: explode the bin
    // offset on its own, then fold it into the bin number.
    val l = left
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bin", col("__off") + binOf(left(leftTsCol)))
      .drop("__off")
      .withColumn("__k", left(keyCol))

    l.join(r, Seq("__k", "__bin"))
      .filter(abs(unix_micros(left(leftTsCol)) - unix_micros(col("__r")(rightTsCol)))
        <= lit(deltaUs))
      .select(left.columns.map(c => col(c)) ++
        rightPayload.map(c => col(s"__r.$c").as(s"$rightPrefix$c")): _*)
  }
}
