package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based statistics. Spearman's rho per group = Pearson
  * correlation of tie-averaged fractional ranks (the standard
  * tie-corrected definition): the average rank of a tie group is its
  * min rank plus (ties−1)/2, i.e. `rank()` over the value order plus a
  * count over the value partition.
  *
  * Scale shape: both rank columns come from windows keyed on the SAME
  * group column (one shuffle, two in-partition sorts), and the final
  * correlation is a one-pass co-moment aggregate — no global window,
  * no per-group buffering beyond the sort.
  */
object Stats {

  /** @return one row per group: groupCol, n, spearman (rounded to 4) */
  def spearmanByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val wx = Window.partitionBy(groupCol).orderBy(xCol)
    val wy = Window.partitionBy(groupCol).orderBy(yCol)
    val cx = Window.partitionBy(groupCol, xCol)
    val cy = Window.partitionBy(groupCol, yCol)
    df.select(groupCol, xCol, yCol)
      .withColumn("__rx", rank().over(wx) + (count(lit(1)).over(cx) - 1) / 2.0)
      .withColumn("__ry", rank().over(wy) + (count(lit(1)).over(cy) - 1) / 2.0)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), round(corr("__rx", "__ry"), 4).as("spearman"))
  }
}
