package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned shuffle join — the runtime-filter pattern
  * ([[BloomDedup]]'s sibling for JOINs): when an equi-join's build
  * side is small after its own filters but too big to broadcast as a
  * hash relation, a bloom filter over its join keys IS broadcastable
  * (bits, not rows — ~1.2 GB for 10^9 keys at 1% fpp), and probing it
  * on the big side BEFORE the shuffle drops the rows that cannot
  * match. Every surviving false positive is removed by the exact join
  * itself, so the result is EXACTLY the plain join for every fpp —
  * the bloom only prunes shuffle traffic, it never decides matches.
  * That is what makes the operator oracle-verifiable (q169's oracle
  * is the plain SQL join).
  *
  * Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
  * applies the same rewrite, but only when its creation-side
  * size/selectivity heuristics fire; this operator is the explicit
  * form for when the pipeline author KNOWS the build side is
  * selective (the reference scenario: a 100 TB fact table joined to
  * the day's small dimension delta).
  *
  * Scale shape: one aggregation over the build side to assemble the
  * bloom (driver-merged, sized by expectedItems/fpp), one broadcast,
  * one narrow probe pass over the big side, then the ordinary
  * shuffle join over the ~selectivity-fraction survivor set.
  */
object BloomJoin {

  /** Inner equi-join big⋈small on bigKey = smallKey, with the big
    * side bloom-pruned before the join shuffle.
    *
    * @param expectedItems sizing hint: distinct keys on the small side
    * @param fpp           false-positive rate — memory vs. extra rows
    *                      that ride the shuffle only to be dropped
    */
  def prunedJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val bf: BloomFilter = small.select(xxhash64(col(smallKey)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
    // NULL keys never join (SQL equality) — the bloom probe's job is
    // only to not LOSE rows, so null-key rows can drop here too.
    big.filter(col(bigKey).isNotNull && mightContain(xxhash64(col(bigKey))))
      .join(small, col(bigKey) === col(smallKey))
  }
}
