package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles WITHOUT per-group value buffers.
  *
  * Spark's builtin exact `percentile` aggregate holds every (value,
  * count) of a group in executor memory — at 100 TB a single group's
  * buffer is the dataset and the job OOMs. This operator computes the
  * same continuous-interpolation quantiles (the `quantile_cont` /
  * type-7 definition: h = (n−1)·p, v = x[⌊h⌋] + (h−⌊h⌋)·(x[⌊h⌋+1] −
  * x[⌊h⌋]) over the 0-indexed sorted values) from a SORT instead of a
  * buffer:
  *
  *   1. one shuffle: rank each row in its group (`row_number`) and
  *      count the group (unbounded window, same shuffle);
  *   2. keep ONLY the rows adjacent to a requested cut point — ≤ 2·|ps|
  *      rows per group survive;
  *   3. per group, sum the weighted bracketing values.
  *
  * Peak memory is the sort's — spillable external sort, never a
  * group-sized heap buffer, so a huge group spills to disk instead of
  * OOMing the executor. The remaining per-group serialization (one
  * window partition per group) is throughput-bound, not memory-bound;
  * for few enormous groups the next refinement is a two-pass
  * bucket-histogram (parallel partial counts → locate the bucket
  * holding each cut point → rescan that bucket), which trades a second
  * scan for full parallelism. `percentile_approx` remains the one-pass
  * sketch alternative when bounded error is acceptable.
  */
object Quantiles {

  /** @param ps quantile fractions in [0, 1], e.g. Seq(0.25, 0.5)
    * @return one row per group: keyCol, q_0 … q_{ps.size-1}
    */
  def exactByGroup(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "fractions in [0,1]")
    val rankW = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
    val groupW = Window.partitionBy(col(keyCol))
    val ranked = df.select(col(keyCol), col(valCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(groupW))

    // A row matters iff it brackets some cut point h_p = (n-1)·p:
    // rn == ⌊h⌋+1 (1-indexed lower) or rn == ⌊h⌋+2 with fractional h.
    val needed = ps.map { p =>
      val h = (col("__n") - 1) * lit(p)
      (col("__rn") === floor(h) + 1) ||
        (col("__rn") === floor(h) + 2 && h > floor(h))
    }.reduce(_ || _)

    val aggs = ps.zipWithIndex.map { case (p, i) =>
      val h = (col("__n") - 1) * lit(p)
      val frac = h - floor(h)
      sum(
        when(col("__rn") === floor(h) + 1, col("__v") * (lit(1.0) - frac))
          .when(col("__rn") === floor(h) + 2, col("__v") * frac)
          .otherwise(lit(0.0))).as(s"q_$i")
    }
    ranked.filter(needed)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
