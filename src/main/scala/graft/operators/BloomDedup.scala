package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered incremental dedup — the 100 TB shape of
  * "which incoming rows are NOT already in the corpus".
  *
  * A plain left-anti join ships EVERY incoming row through the join
  * shuffle even though, in a typical ingest batch, most rows are brand
  * new. The bloom pattern splits incoming rows executor-side first:
  *
  *   1. build a bloom filter over the corpus join keys — one
  *      distributed aggregation (`DataFrameStatFunctions.bloomFilter`),
  *      result is a driver-side bitset sized by expectedItems/fpp
  *      (~1.2 GB for 10^9 keys at 1% — broadcastable);
  *   2. probe the broadcast bitset per incoming row: "definitely new"
  *      rows exit WITHOUT joining — no shuffle, no corpus scan;
  *   3. only "maybe present" rows (true dupes + fpp false positives)
  *      go through the exact left-anti join that removes false
  *      positives.
  *
  * The result is therefore EXACTLY the anti-join result for every fpp —
  * the bloom only routes rows, it never decides membership on its own —
  * which is what makes the operator oracle-verifiable. The bitset probe
  * is the one deliberate Scala-UDF in the engine (a branch-free hash +
  * bit test on a broadcast array; Spark's own runtime-bloom rewrite,
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, applies the same
  * probe but cannot be steered onto an anti-join's streamed side).
  *
  * Reference scope: the streamer dedups nothing (SURVEY §2.5); this is
  * extension operator territory (SURVEY §2.4, E19 family).
  */
object BloomDedup {

  /** Rows of `incoming` whose `keyCol` value does not occur in
    * `corpus.keyCol`. Exact — see class doc.
    *
    * @param expectedItems sizing hint for the corpus bloom
    * @param fpp           false-positive rate: memory vs. share of rows
    *                      that take the exact-join detour
    */
  def newRows(
      incoming: DataFrame,
      corpus: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val spark = incoming.sparkSession
    val corpusKeys = corpus.select(xxhash64(col(keyCol)).as("__h"))
    val bf: BloomFilter = corpusKeys.stat.bloomFilter("__h", expectedItems, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))

    // A null key can never equal a corpus key (SQL equality), so the
    // row is new by definition. The explicit isNull branch is a
    // ROUTING choice, not a correctness guard: xxhash64(NULL) is the
    // seed (non-null), so without the branch a null-key row would take
    // the maybe-dupe detour and still survive the anti-join (NULL
    // never equals __ck) — this just sends it down the free path and
    // keeps null semantics independent of the hash function.
    val hashed = incoming.withColumn("__h", xxhash64(col(keyCol)))
    val definitelyNew = hashed.filter(
      col(keyCol).isNull || !mightContain(col("__h")))
    val maybeDupe = hashed.filter(
      col(keyCol).isNotNull && mightContain(col("__h")))
    val confirmedNew = maybeDupe.join(
      corpus.select(col(keyCol).as("__ck")),
      col(keyCol) === col("__ck"), "left_anti")
    definitelyNew.unionByName(confirmedNew).drop("__h")
  }
}
