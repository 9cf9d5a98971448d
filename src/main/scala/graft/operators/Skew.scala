package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted join (the classic hot-key mitigation for 1000-executor
  * shuffles, complementing AQE's runtime skew-split):
  *
  *   - left (skewed fact) side: append a random salt in [0, factor) to
  *     the join key;
  *   - right (dimension) side: replicate each row `factor` times, one
  *     per salt value;
  *   - join on (key, salt): a key that carried p% of the rows now
  *     spreads over `factor` reducers.
  *
  * Cost: right side inflates ×factor — use only when the right side is
  * small-ish but too big to broadcast outright, and AQE skew handling
  * isn't available (e.g. non-AQE plans, or skew inside aggregations).
  * The salt is `pmod(xxhash64(monotonically_increasing_id()), factor)`
  * — deterministic per task layout, uniformly spread.
  */
object Skew {

  val SaltCol = "__graft_salt"

  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      factor: Int): DataFrame = {
    val salted = skewed.withColumn(
      SaltCol, pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)))
    val replicated = dim.withColumn(
      SaltCol, explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }
}
