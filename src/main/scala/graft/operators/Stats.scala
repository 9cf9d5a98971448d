package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-based statistics. Spearman's rho per group = Pearson
  * correlation of tie-averaged fractional ranks (the standard
  * tie-corrected definition): the average rank of a tie group is its
  * min rank plus (ties−1)/2.
  *
  * Scale shape: a naive `rank().over(partitionBy(group))` sorts each
  * group in ONE task — useless when the group count is small (3 return
  * flags at 100 TB = 3 tasks). Instead ranks come from
  * PrefixSum.globalRank over the composite (group, value) order —
  * range-partitioned, so every task sorts only its slice — and the
  * per-(group, value) min-rank + tie count gives the averaged rank.
  * The global composite rank differs from the within-group rank by a
  * constant per group, and Pearson correlation is shift-invariant, so
  * the group offset never needs to be subtracted. Rows re-acquire
  * their rank by an equi-join on (group, value) — high-cardinality
  * shuffle keys, no few-partition window anywhere (globalRank itself
  * falls back to a single window only below its cost threshold).
  */
object Stats {

  /** @return one row per group: groupCol, n, spearman (rounded to 4) */
  def spearmanByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(xCol).as("__x"), col(yCol).as("__y"))
    def avgRanks(valueCol: String, out: String): DataFrame =
      PrefixSum.globalRank(
        base.select(col(groupCol), col(valueCol)), Seq(groupCol, valueCol), "__rn")
        .groupBy(col(groupCol), col(valueCol))
        .agg((min("__rn") + (count(lit(1)) - 1) / 2.0).as(out))
    base
      .join(avgRanks("__x", "__rx"), Seq(groupCol, "__x"))
      .join(avgRanks("__y", "__ry"), Seq(groupCol, "__y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), round(corr("__rx", "__ry"), 4).as("spearman"))
  }
}
