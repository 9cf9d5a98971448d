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
      // Nulls are excluded from the population (matching the builtin
      // `percentile` and the histogram path below); without this they
      // sort first and shift every rank.
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(groupW))

    // A row matters iff it brackets some cut point h_p = (n-1)·p:
    // rn == ⌊h⌋+1 (1-indexed lower) or rn == ⌊h⌋+2 with fractional h.
    val needed = ps.map { p =>
      val h = (col("__n") - 1) * lit(p)
      (col("__rn") === floor(h) + 1) ||
        (col("__rn") === floor(h) + 2 && h > floor(h))
    }.reduce(_ || _)

    // Interpolate as lo + (hi − lo)·frac — the exact algebraic form
    // DuckDB's quantile_cont and Spark's builtin Percentile use. The
    // equivalent weighted sum lo·(1−frac) + hi·frac differs in the
    // last ulp and can round across a cent boundary (seen at sf0.001).
    val bracketed = ps.zipWithIndex.foldLeft(ranked.filter(needed)) {
      case (df, (p, i)) =>
        val h = (col("__n") - 1) * lit(p)
        df.withColumn(s"__lo_$i", when(col("__rn") === floor(h) + 1, col("__v")))
          .withColumn(s"__hi_$i", when(col("__rn") === floor(h) + 2, col("__v")))
          .withColumn(s"__f_$i", h - floor(h))
    }
    val aggs = ps.indices.flatMap(i => Seq(
      max(col(s"__lo_$i")).as(s"__alo_$i"),
      max(col(s"__hi_$i")).as(s"__ahi_$i"),
      max(col(s"__f_$i")).as(s"__af_$i")))
    val finals = ps.indices.map { i =>
      val lo = col(s"__alo_$i")
      val hi = coalesce(col(s"__ahi_$i"), lo)
      (lo + (hi - lo) * col(s"__af_$i")).as(s"q_$i")
    }
    bracketed
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol) +: finals: _*)
  }

  /** Fully-parallel exact quantiles — the two-pass bucket-histogram
    * refinement for groups too large even to SORT serially (the
    * `exactByGroup` window puts each whole group through one task;
    * here no stage ever sees more than a bucket of one group).
    *
    *   pass 1: per-group (min, max, n) + a `buckets`-bin histogram —
    *     both ordinary partial+final hash aggregations, fully parallel;
    *   locate: a per-group running sum over the ≤`buckets` histogram
    *     rows finds, for every requested rank (⌊h⌋+1 and ⌊h⌋+2 of
    *     h = (n−1)·p), the bin that contains it and how many values
    *     lie below that bin;
    *   pass 2: rescan ONLY rows in located bins (a broadcast semi
    *     filter), rank them within their bin (each bin holds ~n/buckets
    *     rows — the only window, bounded by bin occupancy, not group
    *     size), pick the target ranks, interpolate.
    *
    * Equal values always land in the same bin, so within-bin ties
    * cannot straddle a rank boundary with different values — picked
    * values are deterministic even though tie order is not.
    * Differential-tested against the builtin to 1e-6.
    */
  def exactByGroupHistogram(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[Double],
      buckets: Int = 4096): DataFrame =
    exactByGroupHistogramParts(df, keyCol, valCol, ps, buckets)
      .select(col(keyCol) +: ps.indices.map(i => col(s"q_$i")): _*)

  /** [[exactByGroupHistogram]] exposing the BRACKET values next to
    * each interpolated quantile: per group, `q_i` (the type-7
    * interpolation), `qlo_i` (the value at rank ⌊h⌋+1 — an ACTUAL
    * data value, the type-1/discontinuous quantile) and `qhi_i` (the
    * value at rank ⌊h⌋+2, = qlo when h is integral or the group ends).
    * The disc values are exact data values — audits that must stay
    * rounding-free across engines (cent-valued prices) judge those
    * and keep the interpolation as a bracketing invariant.
    */
  def exactByGroupHistogramParts(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[Double],
      buckets: Int = 4096): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "fractions in [0,1]")
    val base = df.select(col(keyCol).as("__k"), col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)

    // pass 1a: group envelope; 1b: histogram. Bin width from (min,max);
    // a degenerate group (min==max) collapses to bin 0.
    val stats = base.groupBy(col("__k"))
      .agg(min("__v").as("__lo"), max("__v").as("__hi"), count(lit(1)).as("__n"))
    def binOf(v: org.apache.spark.sql.Column) =
      when(col("__hi") === col("__lo"), lit(0L)).otherwise(
        least(floor((v - col("__lo")) / ((col("__hi") - col("__lo")) / lit(buckets))),
          lit(buckets - 1L)).cast("long"))
    val binned = base.join(broadcast(stats), Seq("__k"))
    val hist = binned.groupBy(col("__k"), binOf(col("__v")).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(col("__k")).orderBy(col("__b"))))

    // Target global ranks: for each p both bracketing ranks (upper ==
    // lower when h is integral). frac rides along for interpolation.
    val targets = stats.select(col("__k"), col("__n"),
      explode(array(ps.zipWithIndex.map { case (p, i) =>
        struct(lit(i).as("pi"), lit(p).as("p"))
      }: _*)).as("__t"))
      .select(col("__k"), col("__n"), col("__t.pi").as("__pi"),
        ((col("__n") - 1) * col("__t.p")).as("__h"))
      .select(col("__k"), col("__pi"),
        (col("__h") - floor(col("__h"))).as("__frac"),
        (floor(col("__h")) + 1).cast("long").as("__rlo"),
        least(floor(col("__h")) + 2, col("__n")).cast("long").as("__rhi"))
    val ranks = targets.select(col("__k"), explode(
      array_distinct(array(col("__rlo"), col("__rhi")))).as("__r"))

    // locate: the bin holding each rank (+ count below that bin).
    val located = ranks.join(cum, Seq("__k"))
      .filter(col("__cum") >= col("__r") && col("__cum") - col("__c") < col("__r"))
      .select(col("__k"), col("__r"), col("__b"),
        (col("__cum") - col("__c")).as("__below"))

    // pass 2: rows of located bins only; rank within bin.
    val neededBins = located.select("__k", "__b", "__below").distinct()
    val rankedInBin = binned
      .select(col("__k"), col("__v"), binOf(col("__v")).as("__b"))
      .join(broadcast(neededBins), Seq("__k", "__b"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__k"), col("__b")).orderBy(col("__v").asc)))
    val rankValues = rankedInBin
      .join(broadcast(located), Seq("__k", "__b", "__below"))
      .filter(col("__below") + col("__rn") === col("__r"))
      .select(col("__k"), col("__r"), col("__v"))

    // interpolate per (group, p) and pivot the fractions to columns.
    val lower = rankValues.select(col("__k"), col("__r").as("__rlo"), col("__v").as("__vlo"))
    val upper = rankValues.select(col("__k"), col("__r").as("__rhi"), col("__v").as("__vhi"))
    // Same lo + (hi − lo)·frac form as exactByGroup (ulp parity with
    // DuckDB/builtin — the weighted-sum form rounds differently).
    val interp = targets.join(lower, Seq("__k", "__rlo")).join(upper, Seq("__k", "__rhi"))
      .select(col("__k"), col("__pi"), col("__vlo"), col("__vhi"),
        (col("__vlo") + (col("__vhi") - col("__vlo")) * col("__frac")).as("__q"))
    val aggs = ps.indices.flatMap(i => Seq(
      max(when(col("__pi") === i, col("__q"))).as(s"q_$i"),
      max(when(col("__pi") === i, col("__vlo"))).as(s"qlo_$i"),
      max(when(col("__pi") === i, col("__vhi"))).as(s"qhi_$i")))
    interp.groupBy(col("__k").as(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
