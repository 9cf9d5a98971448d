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

  /** @return one row per group: groupCol, n, spearman (rounded to 4)
    *
    * Physical selection is cost-based, the PrefixSum pattern: below
    * `smallInputBytes` (Catalyst's size estimate of the projected
    * input) the per-group window form is strictly better — two
    * group-partitioned sorts, no union, no checkpoint, no re-acquire
    * joins — and both forms compute the identical tie-averaged ranks,
    * so the result is the same (pinned by SetSimStatsSpec's
    * differential). Above it, the distributed two-pass rank (the
    * group-partitioned window degenerates to one task per group —
    * 3 tasks at 100 TB — and then OOMs). Pass 0 to force distributed.
    */
  def spearmanByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      smallInputBytes: Long = 64L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol),
      col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
    if (base.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(smallInputBytes)) {
      // Averaged rank of the tie class as (min rank + max rank) / 2:
      // rank() is the min rank, and count() under the DEFAULT range
      // frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW — tie-inclusive)
      // is the max rank. Identical value to the former
      // rank + (ties−1)/2 form (min + (max−min)/2, both exact in
      // double: integer sums < 2^53, halving exact), but both window
      // functions now share ONE window spec per axis, so each axis
      // plans a single WindowExec — 2 sort+window passes instead of 4
      // (the tie-count used to need its own partitionBy(group, value)
      // window). Measured −30% on q103 at sf0.1 (r13).
      val wx = Window.partitionBy(groupCol).orderBy("__x")
      val wy = Window.partitionBy(groupCol).orderBy("__y")
      val rx = (rank().over(wx) + count(lit(1)).over(wx)) / 2.0
      val ry = (rank().over(wy) + count(lit(1)).over(wy)) / 2.0
      return base
        .withColumn("__rx", rx).withColumn("__ry", ry)
        .groupBy(groupCol)
        .agg(count(lit(1)).as("n"), round(corr("__rx", "__ry"), 4).as("spearman"))
    }
    // ONE rank pass instead of two: x and y stack into a tagged union
    // and rank together under the (tag, group, value) composite order.
    // Within each tag block the ranks differ from the per-column ranks
    // by a per-(tag, group) constant — which Pearson's shift invariance
    // ignores, exactly as it ignores the per-group offset (doc header).
    // The cast to double only widens (lossless < 2^53) so the union
    // never reorders either column.
    val tagged = base
      .select(lit(0).as("__t"), col(groupCol), col("__x").as("__v"))
      .unionByName(base.select(lit(1).as("__t"), col(groupCol), col("__y").as("__v")))
    // smallInputBytes = 0 forces the distributed rank: the union is 2×
    // the input rows, so the byte-estimate fallback undershoots —
    // measured at sf0.1 the single-partition window sort is SLOWER
    // than the two-pass scan here, and at scale it is a straight OOM.
    val avgR = PrefixSum.globalRank(tagged, Seq("__t", groupCol, "__v"), "__rn",
      smallInputBytes = 0L)
      .groupBy(col("__t"), col(groupCol), col("__v"))
      .agg((min("__rn") + (count(lit(1)) - 1) / 2.0).as("__r"))
      // consumed twice (x leg, y leg): materialize the ~|distinct
      // values| rows once rather than re-running the rank scan
      .localCheckpoint(true)
    base
      .join(avgR.filter(col("__t") === 0)
        .select(col(groupCol), col("__v").as("__x"), col("__r").as("__rx")),
        Seq(groupCol, "__x"))
      .join(avgR.filter(col("__t") === 1)
        .select(col(groupCol), col("__v").as("__y"), col("__r").as("__ry")),
        Seq(groupCol, "__y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), round(corr("__rx", "__ry"), 4).as("spearman"))
  }
}
