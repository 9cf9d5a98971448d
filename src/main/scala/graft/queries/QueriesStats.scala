package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: statistical tests & sketches — hypothesis tests, quantiles, outliers, distribution diagnostics.
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesStats { this: Queries.type =>

  /** DISCRETE (type-1) quantiles for the cross-engine oracle: the
    * picked values are raw data values — no interpolation — because
    * interpolated doubles land on round-half boundaries where DuckDB's
    * float-path `round` and Spark's BigDecimal `round` disagree by one
    * cent (seen at sf0.001). The CONTINUOUS operators
    * (`Quantiles.exactByGroup`/`exactByGroupHistogram`) are verified
    * against Spark's builtin in AsOfJoinSpec instead, where both sides
    * share one FP world. Same scale shape: rank via a spillable sort
    * window, no per-group value buffer.
    */
  def q40_quantiles(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice").asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
    val aggs = ps.map { case (name, p) =>
      max(when(col("rn") === greatest(lit(1L), ceil(lit(p) * col("n"))),
        col("l_extendedprice"))).as(name)
    }
    li.groupBy("l_returnflag")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("l_returnflag")
  }

  /** Equi-width histogram of events.value in 20 bins. min/max ride a
    * 1-row broadcast; the bin expression is the same IEEE arithmetic
    * tree in both engines, so edge assignment is deterministic. At
    * scale this is the one-pass profiling primitive (the quantile
    * histogram's fixed-width cousin).
    */
  def q66_value_histogram(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val stats = ev.agg(min("value").as("mn"), max("value").as("mx"))
    ev.crossJoin(broadcast(stats))
      .select(least(floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / lit(20))),
        lit(19L)).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Per-dimension embedding statistics via posexplode: mean/min/max of
    * the first 8 coordinates across all vectors — the profiling pass a
    * vector pipeline runs before normalization/whitening. Generator is
    * top-level in its projection (codegen'd row expansion).
    */
  def q68_dim_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(posexplode(slice(col("embedding"), 1, 8)).as(Seq("pos", "x")))
      .select((col("pos") + 1).as("dim"), col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        round(avg("x"), 4).as("mean_x"),
        round(min("x"), 4).as("min_x"),
        round(max("x"), 4).as("max_x"))
      .orderBy("dim")

  /** Dispersion statistics per group: sample stddev/variance and the
    * mean, rounded — the profiling aggregates a quality pipeline runs
    * per source/type. All partial+final (Welford-mergeable) aggs.
    */
  def q72_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("value"), 2).as("mean_v"),
        round(stddev_samp(col("value")), 2).as("sd_v"),
        round(var_samp(col("value")), 1).as("var_v"),
        round(min("value"), 2).as("min_v"),
        round(max("value"), 2).as("max_v"))
      .orderBy("event_type")

  /** Per-entity z-score anomaly flags: events deviating more than 2
    * sample-stddevs from their user's mean value, counted per event
    * type. The per-user stats join is a broadcast (users ≪ events);
    * the flag predicate is evaluated on identical doubles in both
    * engines (integer-exact counts, sums compared far from the
    * threshold).
    */
  def q86_anomaly_zscore(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val stats = ev.groupBy("user_id")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
    ev.join(broadcast(stats), "user_id")
      .filter(col("sd").isNotNull && abs(col("value") - col("mu")) > lit(2) * col("sd"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_outliers"), round(sum("value"), 2).as("sum_outlier_value"))
      .orderBy("event_type")
  }

  /** Equi-depth feature binning: lineitem prices cut into 10
    * equal-population bins, per bin the support and value envelope —
    * the discretization step feature pipelines run before categorical
    * models. A builtin global `ntile` window would move every row to
    * ONE task; instead the global rank comes from PrefixSum.globalRank
    * (two-pass distributed zipWithIndex, cost-based small-input
    * fallback to the single window at test scale) and the ntile bucket
    * arithmetic — first n mod k buckets one row larger — is
    * reproduced in exact integers from (rank, n, k).
    */
  def q93_equidepth_bins(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val li = t(s, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val k = 10L
    // n rides in as a broadcast 1-row aggregate (q81's pattern), not an
    // eager count(): plan-only inspections must not run a lineitem scan.
    val nDf = li.agg(count(lit(1)).as("__n"))
    val q = floor(col("__n") / k); val rem = col("__n") % k
    val ranked = PrefixSum.globalRank(li,
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"), "r")
      .crossJoin(broadcast(nDf))
    val bin = when(col("r") <= rem * (q + 1), (col("r") - 1) / (q + 1))
      .otherwise(rem + (col("r") - rem * (q + 1) - 1) / q)
      .cast("long") + 1
    ranked
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min("l_extendedprice"), 2).as("lo"),
        round(max("l_extendedprice"), 2).as("hi"))
      .orderBy("bin")
  }

  /** One-pass quantile SKETCH (Greenwald–Khanna via the builtin
    * `percentile_approx`) — the bounded-memory, bounded-error
    * complement to operators/Quantiles' exact paths: state is
    * O(1/ε·log εn) per group regardless of group size, mergeable
    * across partitions, one shuffle. ORACLE-JUDGED via the
    * tolerance-flag pattern (q20's): the sketch's picked values are
    * engine-specific (rank error ≤ εn) so they cannot hash-compare,
    * but the EXACT interpolated quantiles can (DuckDB quantile_cont —
    * identical (1-d)·lo + d·hi definition, round-2 on both sides) and
    * the sketch's accuracy contract becomes a judged boolean: approx
    * within 1% of exact, pinned to literal `true` in the oracle —
    * generous vs the εn=6 rank error at accuracy 10000, tight enough
    * that a broken sketch fails the hash. Round3OpsSpec keeps the
    * rank-error bound construction test.
    */
  def q99_approx_quantiles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50a"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95a"),
        count(lit(1)).as("n"))
    // The exact reference rides Quantiles.exactByGroupHistogramParts
    // (two fully-parallel passes; no stage ever sees more than one
    // bucket of one group) — the right shape for FEW ENORMOUS groups:
    // the builtin exact `percentile` buffers every group value in
    // executor memory, and the sort path single-tasks each group.
    // The hash-judged VALUE columns are the DISCRETE quantiles (qlo:
    // actual cent-valued prices, so no cross-engine rounding exists
    // to disagree on — interpolated midpoints land on half-cents and
    // Spark/DuckDB round() implementations split exactly there); the
    // interpolating form stays judged by the bracketing invariant
    // qlo ≤ q ≤ qhi, and the sketch by its 1%-of-interpolated flag.
    val exact = operators.Quantiles.exactByGroupHistogramParts(
      li.select("l_returnflag", "l_extendedprice"),
      "l_returnflag", "l_extendedprice", Seq(0.5, 0.95))
    approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        col("qlo_0").as("p50_disc"),
        col("qlo_1").as("p95_disc"),
        (abs(col("p50a") - col("q_0")) / col("q_0") <= 0.01).as("p50_apx_ok"),
        (abs(col("p95a") - col("q_1")) / col("q_1") <= 0.01).as("p95_apx_ok"),
        (col("q_0") >= col("qlo_0") && col("q_0") <= col("qhi_0")).as("p50_interp_ok"),
        (col("q_1") >= col("qlo_1") && col("q_1") <= col("qhi_1")).as("p95_interp_ok"))
      .orderBy("l_returnflag")
  }

  /** Bivariate statistical aggregates: Pearson correlation, sample /
    * population covariance, and least-squares regression of price on
    * quantity, per return flag. All are single-pass co-moment
    * aggregates (partial+final merge like sum/count), so the shape at
    * 100 TB is exactly q01's: map-side combine, |groups| rows out.
    */
  def q102_corr_regression(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_s"),
        round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covar_p"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"))
      .orderBy("l_returnflag")

  /** Spearman rank correlation of quantity vs price per return flag —
    * Stats.spearmanByGroup (tie-averaged fractional ranks, one
    * shuffle, no global window; see the operator doc).
    */
  def q103_spearman(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.spearmanByGroup(
      t(s, dir, "lineitem"), "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  /** Column profiling (data-quality pass a training pipeline runs
    * before ingesting a new source): per column — non-null count, null
    * count, exact distinct, min/max/avg — for four lineitem measures,
    * all in ONE aggregation pass. The multi-column exact distincts
    * plan as one Expand (×4 rows) feeding a single partial+final agg;
    * at 100 TB swap countDistinct for approx_count_distinct and the
    * Expand disappears. Wide-to-long via explode of a literal struct
    * array over the single agg row (driver-side 1-row reshape, free).
    */
  def q104_profile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // Non-distinct stats in ONE scan; each exact distinct count as its
    // own narrow sub-agg (column-pruned scan -> partial-deduped
    // shuffle of distinct values only), crossJoined as 1-row frames.
    // Four countDistinct in a single agg would trigger
    // RewriteDistinctAggregates' Expand — every row duplicated 5x
    // through the shuffle (2.7 s vs 1.8 s cold at sf0.1). At 100 TB
    // the same profile would swap exact distinct for the HLL sketch
    // (q20/q132) — exactness here is the oracle contract.
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"null_$c"),
        round(min(col(c)), 2).as(s"min_$c"),
        round(max(col(c)), 2).as(s"max_$c"),
        round(avg(col(c)), 4).as(s"avg_$c"))
    }
    val li = t(s, dir, "lineitem")
    cols.foldLeft(li.agg(aggs.head, aggs.tail: _*)) { (acc, c) =>
      acc.crossJoin(li.select(col(c)).distinct().agg(count(lit(1)).as(s"nd_$c")))
    }
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"n_$c").as("n_nonnull"),
        col(s"null_$c").as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        col(s"min_$c").as("min_v"),
        col(s"max_$c").as("max_v"),
        col(s"avg_$c").as("avg_v"))): _*)).as("m"))
      .select(col("m.*"))
      .orderBy("column")
  }

  /** Robust outlier detection: median / MAD per event type, flagging
    * |x − median| > 3·1.4826·MAD (the normal-consistent MAD scale).
    * Three keyed aggregations with the two 6-row stats tables
    * broadcast back — no global sort. The exact `percentile` builtin
    * buffers per group; at 100 TB swap in Quantiles.exactByGroup
    * (spillable rank path) or approx_percentile — same contract.
    * Both engines compare against the same 4.4478 literal so the
    * threshold constant cannot differ in the last ulp.
    */
  def q109_mad_outliers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(min("med"), 4).as("median"),
        round(min("mad"), 4).as("mad"),
        count_if(col("ad") > lit(4.4478) * col("mad")).as("n_outliers"))
      .orderBy("event_type")
  }

  /** Winsorized (clipped) robust mean per group: p05/p95 picked by the
    * q40 discrete-rank method (value AT rank ceil(p·n) — a raw data
    * value, immune to interpolation-rounding skew), broadcast back as
    * a 3-row stats table, mean over values clipped into [lo, hi].
    * The outlier-robust complement to q109's median/MAD flags: this
    * REPAIRS the aggregate instead of flagging rows.
    */
  def q114_winsorize(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
    val stats = li
      .withColumn("rn", row_number().over(Window.partitionBy("flag").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
      .groupBy("flag").agg(
        max(when(col("rn") === greatest(lit(1L), ceil(lit(0.05) * col("n"))),
          col("v"))).as("lo"),
        max(when(col("rn") === greatest(lit(1L), ceil(lit(0.95) * col("n"))),
          col("v"))).as("hi"))
    li.join(broadcast(stats), "flag")
      .groupBy("flag").agg(
        count(lit(1)).as("n"),
        round(avg(greatest(least(col("v"), col("hi")), col("lo"))), 2).as("wins_mean"),
        round(avg("v"), 2).as("raw_mean"))
      .select(col("flag").as("l_returnflag"), col("n"), col("wins_mean"),
        col("raw_mean"))
      .orderBy("l_returnflag")
  }

  /** Chi-squared independence test (event_type × user cohort) — the
    * statistical gate behind "is this feature correlated with that
    * segment". Emits the full contingency table with expected counts
    * and per-cell χ² contributions rather than one summed statistic:
    * the cell division is a single IEEE op identical on both engines,
    * while a 15-term float SUM would depend on reduction order. The
    * table is the COMPLETED r × c grid (q313's pattern): an
    * (event_type, cohort) pair with zero observations still has
    * expected count E and contribution (0−E)²/E = E — dropping it
    * would understate any statistic a consumer sums from this report.
    * Three tiny aggregates (cells, row totals, column totals)
    * broadcast back onto the bounded grid — the fact table is scanned
    * once.
    */
  def q126_chisq(s: SparkSession, dir: String): DataFrame = {
    val obs = t(s, dir, "events")
      .groupBy(col("event_type"), (col("user_id") % 3).as("cohort"))
      .agg(count(lit(1)).as("n"))
    val grid = obs.select("event_type").distinct()
      .crossJoin(broadcast(obs.select("cohort").distinct()))
    val cells = grid.join(obs, Seq("event_type", "cohort"), "left")
      .select(col("event_type"), col("cohort"), coalesce(col("n"), lit(0L)).as("n"))
    val rt = cells.groupBy("event_type").agg(sum("n").as("r"))
    val ct = cells.groupBy("cohort").agg(sum("n").as("c"))
    val tot = cells.agg(sum("n").as("t"))
    val e = (col("r") * col("c")) / col("t")
    cells.join(rt, "event_type").join(ct, "cohort").crossJoin(tot)
      .select(col("event_type"), col("cohort"), col("n"),
        round(e, 4).as("expected"),
        round((col("n") - e) * (col("n") - e) / e, 4).as("chi2_contrib"))
      .orderBy("event_type", "cohort")
  }

  /** Decile lift / gains table: customers ranked by total spend into
    * equi-depth deciles (q93's exact ntile arithmetic over
    * PrefixSum.globalRank — distributed, no single-partition ntile over
    * the customer universe), then per-decile spend and CUMULATIVE share
    * in integer basis points. The top-decile concentration report
    * behind every "whales" analysis. The cumulative window runs over
    * the 10 AGGREGATED rows only.
    */
  def q138_decile_lift(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val spend = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice") * 100, 0).cast("long").as("cents"))
    // The customer count feeds the bin boundaries as a LAZY 1-row
    // broadcast (q81's pattern) — an eager spend.count() here would run
    // a real job at query-CONSTRUCTION time, during plan-only
    // inspections too, and scan orders an extra time.
    val k = 10L
    val totals = spend.agg(count(lit(1)).as("__n"))
      .select(expr(s"__n div $k").as("__q"), expr(s"__n % $k").as("__rem"))
    val q = col("__q"); val rem = col("__rem")
    val ranked = PrefixSum.globalRank(spend, Seq("cents", "o_custkey"), "r")
      .crossJoin(broadcast(totals))
    val bin = when(col("r") <= rem * (q + 1), (col("r") - 1) / (q + 1))
      .otherwise(rem + (col("r") - rem * (q + 1) - 1) / q)
      .cast("long") + 1
    val deciles = ranked.withColumn("decile", bin)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"))
    val wCum = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    deciles
      .withColumn("cum_cents", sum("cents").over(wCum))
      .withColumn("total_cents", sum("cents").over(wAll))
      .select(col("decile"), col("n_customers"), col("cents"),
        expr("cum_cents * 10000 div total_cents").as("cum_share_bp"))
      .orderBy("decile")
  }

  /** Two-sample Kolmogorov–Smirnov test: is the `value` distribution of
    * clicks the same as purchases? D = max |F_a(v) − F_b(v)| over the
    * pooled support — the canonical distribution-drift gate a feature
    * pipeline runs between snapshots (q203's KL needs binning; KS is
    * binless). Shape: one corpus pass groups values into the DISTINCT-
    * value frame (map-side combined), both empirical CDFs ride the same
    * cost-based PrefixSum.runningTotal (single window at test scale,
    * two-pass distributed zipWithIndex above the threshold — the support
    * of a continuous measure at 100 TB is corpus-sized). Every float is
    * an exact-integer division so the argmax row is engine-identical;
    * the result is the TakeOrdered-1 row (max D, min value on ties).
    */
  def q206_ks_test(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val g = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("value")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("na_v"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("nb_v"))
    val ca = PrefixSum.runningTotal(g, "value", "na_v", "ca")
    val cb = PrefixSum.runningTotal(ca, "value", "nb_v", "cb")
    val tot = g.agg(sum("na_v").as("na"), sum("nb_v").as("nb"))
    cb.crossJoin(broadcast(tot))
      .withColumn("d", abs(col("ca") / col("na") - col("cb") / col("nb")))
      .orderBy(col("d").desc, col("value").asc)
      .limit(1)
      .select(col("value"), col("na"), col("nb"), round(col("d"), 6).as("ks_d"))
  }

  /** A/B test readout: a deterministic user_id-parity arm split, user-
    * grain conversion (≥1 purchase), and the two-proportion pooled
    * z-statistic — the experiment-analysis primitive next to q126's
    * contingency chi² (z is SIGNED: it says which arm wins, and its
    * square is the 2×2 chi²). Everything until the final z is exact
    * integer arithmetic on two broadcast-mergeable partial aggregates
    * (one fact pass, map-side combined); p₀/p₁/p̂ are exact-integer
    * divisions and sqrt is correctly-rounded IEEE, so the rounded z is
    * engine-identical.
    */
  def q220_ab_test(s: SparkSession, dir: String): DataFrame = {
    // conversion = a HIGH-VALUE purchase (>180): at the gate SFs every
    // user has some purchase, so plain any-purchase is degenerate
    // (p̂=1 → zero pooled variance); the thresholded form discriminates
    val perUser = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 180, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("arm", (col("user_id") % 2).cast("int"))
    // both arms in ONE conditional aggregate — no branch-and-rejoin,
    // the user frame is scanned once
    val cells = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
    val p0 = col("c0") / col("n0"); val p1 = col("c1") / col("n1")
    val phat = (col("c0") + col("c1")) / (col("n0") + col("n1"))
    cells
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(p0, 4).as("p0"), round(p1, 4).as("p1"),
        round((p0 - p1) /
          sqrt(phat * (lit(1) - phat) * (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)
          .as("z"))
  }

  /** Kendall τ-b between order count and total spend over the top-100
    * customers — the concordance-based rank correlation whose tie
    * handling q103's Spearman doesn't model (τ-b corrects both axes).
    * The O(n²) pair enumeration is BOUNDED BY CONSTRUCTION to the
    * TakeOrdered-100 frame (4 950 pairs — the statistic any analyst
    * computes on a leaderboard, not the corpus); concordant/discordant/
    * tie cells are exact integer sign tests, τ-b is one division over
    * one IEEE sqrt of integer products.
    */
  def q226_kendall_tau(s: SparkSession, dir: String): DataFrame = {
    val topc = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .orderBy(col("cents").desc, col("o_custkey").asc)
      .limit(100)
    val a = topc.select(col("o_custkey").as("ka"), col("n_orders").as("xa"), col("cents").as("ya"))
    val b = topc.select(col("o_custkey").as("kb"), col("n_orders").as("xb"), col("cents").as("yb"))
    val sx = signum(col("xa") - col("xb")); val sy = signum(col("ya") - col("yb"))
    a.join(b, col("ka") < col("kb"))
      .agg(
        sum(when(sx * sy > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(sx * sy < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(sx === 0 && sy =!= 0, 1L).otherwise(0L)).as("ties_x"),
        sum(when(sy === 0 && sx =!= 0, 1L).otherwise(0L)).as("ties_y"),
        sum(when(sx === 0 && sy === 0, 1L).otherwise(0L)).as("ties_both"))
      .select(col("concordant"), col("discordant"), col("ties_x"), col("ties_y"),
        round((col("concordant") - col("discordant")) /
          sqrt((col("concordant") + col("discordant") + col("ties_x")) *
               (col("concordant") + col("discordant") + col("ties_y"))), 4).as("tau_b"))
  }

  /** McNemar's paired test on the SAME users' conversion before vs
    * after the mid-month boundary — the within-subject companion to
    * q220's between-arm z (did individuals CHANGE, not do groups
    * differ): only the discordant cells b (early-only) and c
    * (late-only) carry signal, χ² = (b−c)²/(b+c). One user-grain
    * conditional aggregate → one row; exact integers with a single
    * final division.
    */
  def q228_mcnemar(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val conv = col("event_type") === "purchase" && col("value") > 180
    val u = t(s, dir, "events")
      .groupBy("user_id")
      .agg(max(when(conv && col("ts") < cut, 1L).otherwise(0L)).as("early"),
        max(when(conv && col("ts") >= cut, 1L).otherwise(0L)).as("late"))
    u.agg(
        sum(when(col("early") === 1 && col("late") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("early") === 0 && col("late") === 1, 1L).otherwise(0L)).as("c"))
      .select(col("b"), col("c"),
        round((col("b") - col("c")) * (col("b") - col("c")) / (col("b") + col("c")), 4)
          .as("chi2"))
  }

  /** Deterministic bootstrap CI for mean user spend: 100 resampling
    * replicas whose per-(user, replica) multiplicities come from a
    * hash-inverted Poisson(1) (the multinomial limit the bootstrap
    * converges to) — no RNG state, both engines rebuild the SAME
    * replicas from md5 arithmetic, so the interval is oracle-exact.
    * The user-grain frame is built once (one fact shuffle), the
    * replica dimension is a 100-way broadcast explode of the USER
    * frame only (never the fact table — at 100 TB that is the "bag of
    * little bootstraps" shape), and the CI is an exact rank pick over
    * the 100 replica means.
    */
  def q233_bootstrap_ci(s: SparkSession, dir: String): DataFrame = {
    val b = 100
    val perUser = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    // Poisson(1) CDF inversion on u = first-8-hex of md5(user|replica):
    // P(0)=.3679, P(≤1)=.7358, P(≤2)=.9197, P(≤3)=.9810
    val u = conv(substring(md5(concat_ws("|", col("user_id"), col("rep"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val w = when(u < 0.3679, 0L).when(u < 0.7358, 1L)
      .when(u < 0.9197, 2L).when(u < 0.9810, 3L).otherwise(4L)
    val reps = perUser
      .crossJoin(broadcast(s.range(0, b).toDF("rep")))
      .withColumn("w", w)
      .groupBy("rep")
      .agg((sum(col("w") * col("cents")) / (sum("w") * lit(100.0))).as("mean_spend"))
    val ranked = reps.withColumn("rk",
      row_number().over(Window.orderBy(col("mean_spend").asc, col("rep").asc)))
    ranked.agg(
        count(lit(1)).as("n_reps"),
        round(avg("mean_spend"), 2).as("boot_mean"),
        round(max(when(col("rk") === 3, col("mean_spend"))), 2).as("ci_lo"),
        round(max(when(col("rk") === 98, col("mean_spend"))), 2).as("ci_hi"))
  }

  /** Difference-in-differences readout: treatment = odd user_id (q220's
    * split), pre/post = the mid-month boundary (q228's), outcome =
    * mean purchase cents per user-period — DiD = (T_post − T_pre) −
    * (C_post − C_pre), the causal-inference workhorse when only the
    * treated arm changed between periods. All four cell means are
    * exact integer-cent sums over one conditional aggregate; the
    * estimate is arithmetic on four exact quotients. The parallel-
    * trends assumption is the ANALYST's burden; the engine's burden is
    * cells that cannot disagree between engines — and they can't.
    */
  def q239_diff_in_diff(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val p = t(s, dir, "events").filter(col("event_type") === "purchase")
      .select((col("user_id") % 2 === 1).cast("int").as("treated"),
        (col("ts") >= cut).cast("int").as("post"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val cells = p.agg(
      sum(when(col("treated") === 1 && col("post") === 0, 1L).otherwise(0L)).as("nt0"),
      sum(when(col("treated") === 1 && col("post") === 0, col("cents")).otherwise(0L)).as("st0"),
      sum(when(col("treated") === 1 && col("post") === 1, 1L).otherwise(0L)).as("nt1"),
      sum(when(col("treated") === 1 && col("post") === 1, col("cents")).otherwise(0L)).as("st1"),
      sum(when(col("treated") === 0 && col("post") === 0, 1L).otherwise(0L)).as("nc0"),
      sum(when(col("treated") === 0 && col("post") === 0, col("cents")).otherwise(0L)).as("sc0"),
      sum(when(col("treated") === 0 && col("post") === 1, 1L).otherwise(0L)).as("nc1"),
      sum(when(col("treated") === 0 && col("post") === 1, col("cents")).otherwise(0L)).as("sc1"))
    def mean(sm: String, n: String) = col(sm) / col(n) / lit(100.0)
    cells.select(
      round(mean("st0", "nt0"), 4).as("treat_pre"),
      round(mean("st1", "nt1"), 4).as("treat_post"),
      round(mean("sc0", "nc0"), 4).as("ctrl_pre"),
      round(mean("sc1", "nc1"), 4).as("ctrl_post"),
      round((mean("st1", "nt1") - mean("st0", "nt0")) -
        (mean("sc1", "nc1") - mean("sc0", "nc0")), 4).as("did"))
  }

  /** Exponential (log2-bucketed) value histogram — the DDSketch-shaped
    * observability summary: bucket = ⌊log2(cents)⌋, covering 5 orders
    * of magnitude in ~17 buckets with fixed relative error, the way
    * latency/value telemetry is actually stored. Bucketing is on exact
    * integer cents, and log2 of an exact power of two is exactly that
    * integer in IEEE (no boundary flicker) — so the bucket assignment
    * is engine-identical. One map-side-combined aggregate.
    */
  def q240_exp_histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100, 0).cast("long").as("cents"))
      .filter(col("cents") >= 1)
      .withColumn("bucket", floor(log2(col("cents"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("cents").as("lo_cents"), max("cents").as("hi_cents"))
      .orderBy("bucket")

  /** Theil-Sen robust trend: the MEDIAN of all pairwise day-slopes of
    * the daily purchase series — one outlier day corrupts an OLS
    * slope but moves a median of C(n,2) slopes almost nothing (the
    * robust companion to q234's ACF and q227's CUSUM). The pair
    * enumeration is DAY-grain bounded (C(days,2), never corpus rows);
    * each slope is one exact-integer-over-integer division, the median
    * an exact rank pick with a (i,j) tiebreak.
    */
  def q254_theil_sen(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
    val a = daily.select(col("d").as("da"), col("n").as("na"))
    val b = daily.select(col("d").as("db"), col("n").as("nb"))
    val slopes = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"),
        ((col("nb") - col("na")) / (col("db") - col("da"))).as("slope"))
    val m = slopes.agg(count(lit(1)).as("np"))
    slopes.crossJoin(broadcast(m))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("slope").asc, col("da").asc, col("db").asc)))
      .filter(col("rk").cast("long") === ((col("np") + 1) / 2).cast("long"))
      .select(col("np").as("n_pairs"), round(col("slope"), 4).as("theil_sen_slope"))
  }

  /** Multivariate text-shape outliers: documents ranked by the sum of
    * squared per-feature z-scores over (token count, char count,
    * mean-word-length numerator) — the diagonal-covariance Mahalanobis
    * screen that catches docs no SINGLE feature flags (long AND
    * weirdly-punctuated), where q86/q109 are univariate. The z² terms
    * are spelled as (x·n − S)²/(n·Σx² − S²): every component an exact
    * 64-bit integer from one corpus aggregate, each term one exact
    * division, the 3-term sum a fixed-shape expression — so the
    * ranking is engine-identical with no float-variance hazard.
    */
  def q257_multivariate_outliers(s: SparkSession, dir: String): DataFrame = {
    val base = tWide(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("f1"),
        length(col("text")).cast("long").as("f2"),
        size(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
          .cast("long").as("f3"))
    val m = base.agg(
      count(lit(1)).as("n"),
      sum("f1").as("s1"), sum(col("f1") * col("f1")).as("q1"),
      sum("f2").as("s2"), sum(col("f2") * col("f2")).as("q2"),
      sum("f3").as("s3"), sum(col("f3") * col("f3")).as("q3"))
    def z2(x: Column, sm: Column, q: Column, n: Column): Column =
      ((x * n - sm) * (x * n - sm)) / (n * q - sm * sm)
    base.crossJoin(broadcast(m))
      .withColumn("score", round(
        z2(col("f1"), col("s1"), col("q1"), col("n")) +
          z2(col("f2"), col("s2"), col("q2"), col("n")) +
          z2(col("f3"), col("s3"), col("q3"), col("n")), 6))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(15)
      .select("doc_id", "f1", "f2", "f3", "score")
  }

  /** One-way ANOVA across weekdays: does the day-of-week MEAN purchase
    * count differ significantly — the F-statistic that upgrades q156's
    * descriptive seasonal profile to a test (and tells q234's ACF
    * whether its lag-7 bump is signal). Between/within sums of squares
    * from exact integer moments per weekday group — F is arithmetic on
    * exact rationals, engine-identical; the day-grain frame keeps the
    * whole computation calendar-sized.
    */
  def q259_anova_weekday(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("wd", dayofweek(col("day")).cast("long"))
    val g = daily.groupBy("wd")
      .agg(count(lit(1)).as("ng"), sum("n").as("sg"), sum(col("n") * col("n")).as("qg"))
    val tot = g.agg(sum("ng").as("n"), sum("sg").as("s"), sum("qg").as("q"),
      count(lit(1)).as("k"))
    // SSB = Σ sg²/ng − s²/n ; SSW = q − Σ sg²/ng — exact-rational parts
    val parts = g.agg(sum(col("sg") * col("sg") / col("ng")).as("ssb_part"))
    tot.crossJoin(broadcast(parts))
      .select(
        col("k"), col("n").as("n_days"),
        round((col("ssb_part") - col("s") * col("s") / col("n")) / (col("k") - 1), 4)
          .as("ms_between"),
        round((col("q") - col("ssb_part")) / (col("n") - col("k")), 4).as("ms_within"),
        // zero within-variance (a perfectly deterministic schedule) has
        // no defined F — report NULL rather than divide by zero
        when(col("q") - col("ssb_part") > 0,
          round(((col("ssb_part") - col("s") * col("s") / col("n")) / (col("k") - 1)) /
            ((col("q") - col("ssb_part")) / (col("n") - col("k"))), 4)).as("f_stat"))
  }

  /** Revenue whale curve: cumulative share of total spend by customer
    * decile (biggest spenders first) — the concentration TABLE behind
    * q208's single Gini number ("the top 10% carry 40% of revenue").
    * Deciles by q93's exact ntile integer arithmetic over
    * PrefixSum.globalRank (cost-based, never a mandatory global
    * window); spend in exact integer cents; shares are cumulative
    * integer sums with one division per decile row.
    */
  def q260_whale_curve(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val spend = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      // rank by (−cents, user): biggest first, deterministic
      .withColumn("neg", -col("cents"))
    val k = 10L
    val nDf = spend.agg(count(lit(1)).as("__n"), sum("cents").as("__tot"))
    val ranked = PrefixSum.globalRank(spend, Seq("neg", "user_id"), "r")
      .crossJoin(broadcast(nDf))
    val q = floor(col("__n") / k); val rem = col("__n") % k
    val bin = when(col("r") <= rem * (q + 1), (col("r") - 1) / (q + 1))
      .otherwise(rem + (col("r") - rem * (q + 1) - 1) / q)
      .cast("long") + 1
    val byDecile = ranked.withColumn("decile", bin)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("dc"))
    byDecile
      .withColumn("cum_cents", sum("dc").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(nDf.select(col("__tot"))))
      .select(col("decile"), col("n_users"),
        round(col("dc") / lit(100.0), 2).as("decile_spend"),
        round(col("cum_cents") / col("__tot"), 4).as("cum_share"))
      .orderBy("decile")
  }

  /** Kaplan-Meier time-to-conversion curve: S(t) = Π(1 − dᵢ/nᵢ) =
    * probability a user is still UNCONVERTED t days after first touch,
    * with users who don't purchase inside the 5-day attribution window
    * right-CENSORED at day 5 (they exit the risk set without counting
    * as a conversion — the estimator's entire point; a naive
    * conversion-rate curve over-counts the denominator). Lifetimes
    * aggregate to a DAY-GRAIN duration frame (bounded by the
    * attribution window, never corpus rows), so the sequential windows
    * — at-risk countdown and the cumulative log-survival — are global
    * windows over a calendar-sized frame by design, the q234/q227
    * pattern. dᵢ and nᵢ are exact integers; the one floating-point
    * step (exp∘Σln for the product) is rounded once. Standard tie
    * rule: deaths at t precede censorings at t, so both stay in the
    * t-risk set (the n_risk arithmetic below encodes exactly that).
    */
  def q262_kaplan_meier(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "events")
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_d"),
        min(when(col("event_type") === "purchase", to_date(col("ts")))).as("conv_d"))
    val lag = datediff(col("conv_d"), col("first_d"))
    val conv = col("conv_d").isNotNull && lag <= 5
    val byDur = users
      .select(when(conv, lag).otherwise(5).cast("long").as("dur"),
        conv.as("converted"))
      .groupBy("dur")
      .agg(count(lit(1)).as("ended"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("d"))
    val tot = byDur.agg(sum("ended").as("n_users"))
    val w = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur.crossJoin(broadcast(tot))
      .withColumn("cum", sum("ended").over(w))
      .withColumn("n_risk", col("n_users") - col("cum") + col("ended"))
      // d = n_risk (the whole remaining risk set converts at t) sends
      // the product to EXACTLY 0 — handled as a sticky flag, never as
      // ln(0) (Spark nulls it, DuckDB raises; both wrong)
      .withColumn("hit0",
        max((col("d") === col("n_risk")).cast("long")).over(w))
      .withColumn("surv", when(col("hit0") === 1, lit(0.0))
        .otherwise(round(exp(sum(
          when(col("d") > 0 && col("d") < col("n_risk"),
            log(lit(1.0) - col("d") / col("n_risk")))
            .otherwise(lit(0.0))).over(w)), 4)))
      .filter(col("d") > 0)
      .select(col("dur").as("t_days"), col("n_risk"), col("d").as("deaths"),
        col("surv"))
      .orderBy("t_days")
  }

  /** Population stability index of the purchase-value distribution,
    * first half of the date range vs second — the standard drift gate
    * before re-using a trained model/feature on fresh data (PSI < 0.1
    * stable, > 0.25 drifted). Ten equal-width bins over the GLOBAL
    * value envelope; envelope and period split ride in as 1-row
    * broadcast aggregates (q81's pattern — no eager action at
    * construction). Counts are exact; the ±0.5 Laplace smoothing
    * keeps empty bins finite without dropping them; bin edges use one
    * identically-ordered float expression on both engines so bin
    * assignment is bit-identical.
    */
  def q263_psi_drift(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), col("value"))
    val env = p.agg(min("day").as("d0"), max("day").as("d1"),
      min("value").as("v0"), max("value").as("v1"))
    val g = p.crossJoin(broadcast(env))
      .withColumn("late",
        datediff(col("day"), col("d0")) * 2 > datediff(col("d1"), col("d0")))
      .withColumn("bin",
        least(floor((col("value") - col("v0")) * 10.0 / (col("v1") - col("v0"))),
          lit(9.0)).cast("long"))
      .groupBy("bin")
      .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("na"),
        sum(when(col("late"), 1L).otherwise(0L)).as("nb"))
    val tot = g.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val pa = (col("na") + 0.5) / (col("ta") + 5.0)
    val pb = (col("nb") + 0.5) / (col("tb") + 5.0)
    g.crossJoin(broadcast(tot))
      .select(col("bin"), col("na"), col("nb"),
        round((pa - pb) * log(pa / pb), 6).as("psi"))
      .orderBy("bin")
  }

  /** Tukey-HSD-style post-hoc pairwise comparisons after q259's
    * one-way ANOVA: WHICH weekday pairs differ, via the studentized
    * statistic (mean_a − mean_b)/√(MSW/2·(1/n_a + 1/n_b)) over the
    * same exact integer moments (per-weekday count/sum/sum-of-squares
    * of daily purchase counts). The pair frame is C(7,2) = 21 rows by
    * construction — the inequality self-join is a bounded broadcast,
    * q254's pattern — and MSW rides in as a 1-row broadcast aggregate.
    * Means and MSW are single divisions of exact integers; the only
    * compounding float is the final statistic, rounded once. Weekday
    * ids use Spark's 1=Sunday..7=Saturday convention (the oracle maps
    * DuckDB's 0-based convention onto it).
    */
  def q265_tukey_hsd(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("wd", dayofweek(col("day")).cast("long"))
    val g = daily.groupBy("wd")
      .agg(count(lit(1)).as("ng"), sum("n").as("sg"),
        sum(col("n") * col("n")).as("qg"))
    val msw = g.agg(
      ((sum("qg") - sum(col("sg") * col("sg") / col("ng"))) /
        (sum("ng") - count(lit(1)))).as("msw"))
    val a = g.select(col("wd").as("wd_a"), (col("sg") / col("ng")).as("ma"),
      col("ng").as("na"))
    val b = g.select(col("wd").as("wd_b"), (col("sg") / col("ng")).as("mb"),
      col("ng").as("nb"))
    a.join(b, col("wd_a") < col("wd_b"))
      .crossJoin(broadcast(msw))
      .select(col("wd_a"), col("wd_b"),
        round(col("ma") - col("mb"), 4).as("mean_diff"),
        round((col("ma") - col("mb")) /
          sqrt(col("msw") / 2.0 *
            (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4).as("q_stat"))
      .orderBy("wd_a", "wd_b")
  }

  /** Covariate balance audit of the q90 deterministic hash split:
    * standardized mean difference (SMD) of per-user behavioral
    * covariates between the train (hash bucket < 80) and holdout
    * sides — the pre-modeling check that a split didn't accidentally
    * concentrate heavy users on one side (|SMD| < 0.1 is the usual
    * "balanced" bar). One pass builds the per-user covariate frame;
    * stack() melts it to (feature, x) rows so ONE grouped aggregate
    * computes every feature's exact count/sum/sum-of-squares per side
    * — adding a covariate is a new stack slot, not a new scan. SMD
    * uses the pooled-variance form (var_t + var_c)/2 with sample
    * variances from exact moments; one rounded output per feature.
    */
  def q267_covariate_balance(s: SparkSession, dir: String): DataFrame = {
    val inTrain =
      pmod(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)), lit(100L)) < 80
    val u = t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).cast("double").as("f_events"),
        sum("value").as("f_value"),
        countDistinct(to_date(col("ts"))).cast("double").as("f_days"),
        countDistinct("event_type").cast("double").as("f_types"))
      .withColumn("t", when(inTrain, 1L).otherwise(0L))
    val m = u.select(col("t"), expr(
      "stack(4, 'active_days', f_days, 'n_events', f_events, " +
        "'n_types', f_types, 'total_value', f_value) AS (feature, x)"))
    val g = m.groupBy("feature").agg(
      sum(col("t")).as("nt"),
      sum(when(col("t") === 1, col("x"))).as("st"),
      sum(when(col("t") === 1, col("x") * col("x"))).as("qt"),
      sum(lit(1L) - col("t")).as("nc"),
      sum(when(col("t") === 0, col("x"))).as("sc"),
      sum(when(col("t") === 0, col("x") * col("x"))).as("qc"))
    // a zero-variance covariate on both sides (e.g. every user holds
    // every event type) has no defined SMD — report NULL, q259's rule
    val pooled =
      ((col("qt") - col("st") * col("st") / col("nt")) / (col("nt") - 1) +
        (col("qc") - col("sc") * col("sc") / col("nc")) / (col("nc") - 1)) / 2.0
    g.select(col("feature"), col("nt"), col("nc"),
      round(col("st") / col("nt"), 4).as("mean_t"),
      round(col("sc") / col("nc"), 4).as("mean_c"),
      when(pooled > 0, round(
        (col("st") / col("nt") - col("sc") / col("nc")) / sqrt(pooled), 4))
        .as("smd"))
      .orderBy("feature")
  }

  /** Wald-Wolfowitz runs test on daily revenue vs its median: is the
    * above/below-median sequence RANDOM, or does it trend/oscillate
    * (too few runs = regime persistence, too many = overcorrection) —
    * the independence check q234's ACF assumes away. Day-grain frame
    * throughout (calendar-bounded sequential windows, the q234/q227
    * pattern); daily revenue is rounded once so the median pick and
    * every comparison are engine-identical; the lower median is an
    * actual data value selected by exact rank arithmetic, never an
    * interpolated float. Runs/n1/n0 are exact integers; z is the one
    * float, rounded, NULL when the variance degenerates (all days on
    * one side).
    */
  def q269_runs_test(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val ranked = daily.withColumn("r",
      row_number().over(Window.orderBy("rev", "day")).cast("long"))
    val medDf = ranked
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("nn"))))
      .filter(col("r") === floor((col("nn") + 1) / 2.0))
      .select(col("rev").as("med"))
    val seq = daily.crossJoin(broadcast(medDf))
      .withColumn("s", (col("rev") > col("med")).cast("long"))
      .withColumn("prev", lag("s", 1).over(Window.orderBy("day")))
      .withColumn("is_new",
        when(col("prev").isNull || col("prev") =!= col("s"), 1L).otherwise(0L))
    val a = seq.agg(sum("is_new").as("runs"), sum("s").as("n1"),
      sum(lit(1L) - col("s")).as("n0"))
    val n = col("n1") + col("n0")
    val mu = lit(2.0) * col("n1") * col("n0") / n + 1
    val va = lit(2.0) * col("n1") * col("n0") *
      (lit(2.0) * col("n1") * col("n0") - n) / (n * n * (n - lit(1.0)))
    a.select(col("runs"), col("n1"), col("n0"),
      when(va > 0, round((col("runs") - mu) / sqrt(va), 4)).as("z"))
  }

  /** Decile QQ table, weekday vs weekend purchase values: where the
    * two distributions diverge — the location readout behind q261's
    * single Mann-Whitney number ("the gap opens in the top deciles").
    * Each side independently gets q93/q260's EXACT equi-depth decile
    * arithmetic over [[PrefixSum.globalRank]] (cost-based, never a
    * mandatory single-partition window over raw rows); each decile
    * reports its max — an actual data value, so the whole table is
    * exact except the one rounded gap column.
    */
  def q270_qq_deciles(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    def deciles(df: DataFrame, outCol: String): DataFrame = {
      val k = 10L
      val nDf = df.agg(count(lit(1)).as("__n"))
      val ranked = PrefixSum.globalRank(df, Seq("value", "event_id"), "r")
        .crossJoin(broadcast(nDf))
      val q = floor(col("__n") / k); val rem = col("__n") % k
      val bin = when(col("r") <= rem * (q + 1), (col("r") - 1) / (q + 1))
        .otherwise(rem + (col("r") - rem * (q + 1) - 1) / q)
        .cast("long") + 1
      ranked.withColumn("decile", bin)
        .groupBy("decile").agg(max(col("value")).as(outCol))
    }
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("wk", dayofweek(col("ts")).isin(1, 7))
      .select(col("event_id"), col("value"), col("wk"))
    deciles(p.filter(!col("wk")), "q_weekday")
      .join(deciles(p.filter(col("wk")), "q_weekend"), "decile")
      .select(col("decile"), col("q_weekday"), col("q_weekend"),
        round(col("q_weekend") - col("q_weekday"), 2).as("gap"))
      .orderBy("decile")
  }

  /** Cohen's d effect size (with the Hedges' g small-sample
    * correction) for weekend vs weekday purchase values — the
    * magnitude readout q261's Mann-Whitney significance omits: a tiny
    * shift turns "significant" at scale, so pipelines gate on d, not
    * p. One conditional aggregate computes both groups' exact
    * count/sum/sum-of-squares in a single pass; pooled SD and both
    * statistics are arithmetic on those moments, rounded once each.
    */
  def q272_cohens_d(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("wk", dayofweek(col("ts")).isin(1, 7))
      .agg(
        sum(when(!col("wk"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("wk"), col("value"))).as("s1"),
        sum(when(!col("wk"), col("value") * col("value"))).as("q1"),
        sum(when(col("wk"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("wk"), col("value"))).as("s2"),
        sum(when(col("wk"), col("value") * col("value"))).as("q2"))
    val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val v2 = (col("q2") - col("s2") * col("s2") / col("n2")) / (col("n2") - 1)
    val sp = sqrt(((col("n1") - 1) * v1 + (col("n2") - 1) * v2) /
      (col("n1") + col("n2") - 2))
    val d = (col("s1") / col("n1") - col("s2") / col("n2")) / sp
    a.select(col("n1").as("n_weekday"), col("n2").as("n_weekend"),
      round(col("s1") / col("n1"), 4).as("mean_weekday"),
      round(col("s2") / col("n2"), 4).as("mean_weekend"),
      round(d, 4).as("cohens_d"),
      round(d * (lit(1.0) - lit(3.0) /
        (lit(4.0) * (col("n1") + col("n2")) - 9)), 4).as("hedges_g"))
  }

  /** TOST equivalence test between the q90 hash split's sides: are
    * train and holdout purchase values EQUIVALENT within a ±5%-of-
    * holdout-mean margin — the positive claim q267's SMD audit only
    * hints at (failing to find a difference is not evidence of
    * equivalence; two one-sided tests are). Both one-sided z
    * statistics come from the same single-pass conditional moments
    * (Welch SE); equivalence holds when z_lower > 1.645 AND z_upper <
    * −1.645, both tails at α = 0.05. All floats derive from exact
    * moments with one rounding each.
    */
  def q274_tost_equivalence(s: SparkSession, dir: String): DataFrame = {
    val inTrain =
      pmod(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)), lit(100L)) < 80
    val a = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("t", when(inTrain, 1L).otherwise(0L))
      .agg(
        sum(col("t")).as("nt"),
        sum(when(col("t") === 1, col("value"))).as("st"),
        sum(when(col("t") === 1, col("value") * col("value"))).as("qt"),
        sum(lit(1L) - col("t")).as("nc"),
        sum(when(col("t") === 0, col("value"))).as("sc"),
        sum(when(col("t") === 0, col("value") * col("value"))).as("qc"))
    val mt = col("st") / col("nt"); val mc = col("sc") / col("nc")
    val vt = (col("qt") - col("st") * col("st") / col("nt")) / (col("nt") - 1)
    val vc = (col("qc") - col("sc") * col("sc") / col("nc")) / (col("nc") - 1)
    val se = sqrt(vt / col("nt") + vc / col("nc"))
    val margin = mc * 0.05
    a.select(col("nt"), col("nc"),
      round(mt, 4).as("mean_train"), round(mc, 4).as("mean_holdout"),
      round(margin, 4).as("margin"),
      round((mt - mc + margin) / se, 4).as("z_lower"),
      round((mt - mc - margin) / se, 4).as("z_upper"),
      ((mt - mc + margin) / se > 1.645 &&
        (mt - mc - margin) / se < -1.645).as("equivalent"))
  }

  /** Herfindahl-Hirschman concentration of order revenue across the
    * nations of each region — the antitrust-style "is this market a
    * monopoly" index (HHI > 2500 = highly concentrated), and the
    * supplier-risk readout for a region's order book. Fact rows join
    * the BROADCAST customer→nation→region dimension path (q02's
    * shape — the orders side never shuffles for the dims), revenue is
    * exact integer cents (q260's rule), and HHI = 10000·Σ share² is
    * one division per nation row then an exact-ordered sum over a
    * bounded (≤ nations-per-region) frame.
    */
  def q275_hhi_concentration(s: SparkSession, dir: String): DataFrame = {
    val byNation = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val byRegion = byNation.groupBy("r_name")
      .agg(sum("cents").as("tot"), count(lit(1)).as("n_nations"))
    byNation.join(byRegion, "r_name")
      .groupBy("r_name", "n_nations")
      .agg(round(sum(
        (col("cents") / col("tot")) * (col("cents") / col("tot")) * 10000
      ), 2).as("hhi"))
      .select(col("r_name"), col("n_nations"), col("hhi"))
      .orderBy("r_name")
  }

  /** Jarque-Bera normality test on the daily-revenue series: JB =
    * n/6·(S² + (K−3)²/4) from skewness and excess kurtosis — the
    * cheap gate before any analysis that assumes Gaussian daily
    * aggregates (q86's z-scores, q144's forecast intervals). One
    * day-grain aggregate collects the raw power sums (day counts keep
    * every magnitude inside double's exact-integer range); central
    * moments, S, K, and JB are one fixed-order arithmetic expression
    * each, mirrored verbatim in the oracle, rounded once.
    */
  def q276_jarque_bera(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val a = daily.agg(count(lit(1)).cast("double").as("n"),
      sum("rev").as("s1"), sum(col("rev") * col("rev")).as("s2"),
      sum(col("rev") * col("rev") * col("rev")).as("s3"),
      sum(col("rev") * col("rev") * col("rev") * col("rev")).as("s4"))
    val m = col("s1") / col("n")
    val m2 = col("s2") / col("n") - m * m
    val m3 = col("s3") / col("n") - m * (col("s2") / col("n")) * 3 + m * m * m * 2
    val m4 = col("s4") / col("n") - m * (col("s3") / col("n")) * 4 +
      m * m * (col("s2") / col("n")) * 6 - m * m * m * m * 3
    val sk = m3 / sqrt(m2 * m2 * m2)
    val ku = m4 / (m2 * m2)
    a.select(col("n").cast("long").as("n_days"),
      round(sk, 4).as("skewness"),
      round(ku - 3, 4).as("excess_kurtosis"),
      round(col("n") / 6.0 * (sk * sk + (ku - 3) * (ku - 3) / 4.0), 4).as("jb"))
  }

  /** Grubbs' maximum-studentized-deviate test on daily revenue: the
    * single most extreme day and how many sample SDs it sits from the
    * mean — the formal "is this one day an outlier" complement to
    * q86's per-row z-flags (Grubbs is the statistic its critical
    * tables are built for). Moments ride in as a 1-row broadcast
    * aggregate; G is one fixed-order float expression; the argmax is
    * integer/na-safe TakeOrdered with a day tie-break, so the
    * selected row is engine-identical.
    */
  def q277_grubbs(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val mom = daily.agg(count(lit(1)).cast("double").as("n"),
      sum("rev").as("s1"), sum(col("rev") * col("rev")).as("s2"))
    val mean = col("s1") / col("n")
    val sd = sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
    daily.crossJoin(broadcast(mom))
      .withColumn("g", abs(col("rev") - mean) / sd)
      .orderBy(col("g").desc, col("day").asc)
      .limit(1)
      .select(col("n").cast("long").as("n_days"), col("day"), col("rev"),
        round(col("g"), 4).as("g_stat"))
  }

  /** Levene's test (mean-centered form) for variance homogeneity of
    * daily purchase counts across weekdays — the assumption check
    * BEHIND q259's ANOVA (its F is only calibrated when group
    * variances match; Levene is how you find out). Group means join
    * back as a bounded broadcast (≤7 rows); the absolute deviations
    * then run the same one-way F machinery as q259, here on the
    * day-grain z frame. All counts/sums exact; the F statistic is the
    * one rounded float, NULL when the within-group spread degenerates.
    */
  def q278_levene(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("wd", dayofweek(col("day")).cast("long"))
    val gm = daily.groupBy("wd")
      .agg((sum("x") / count(lit(1))).as("gmean"))
    val z = daily.join(broadcast(gm), "wd")
      .select(col("wd"), abs(col("x") - col("gmean")).as("z"))
    val g = z.groupBy("wd")
      .agg(count(lit(1)).as("ng"), sum("z").as("sg"),
        sum(col("z") * col("z")).as("qg"))
    val tot = g.agg(sum("ng").as("n"), sum("sg").as("s"), sum("qg").as("q"),
      count(lit(1)).as("k"),
      sum(col("sg") * col("sg") / col("ng")).as("ssb_part"))
    val ssb = col("ssb_part") - col("s") * col("s") / col("n")
    val ssw = col("q") - col("ssb_part")
    tot.select(col("k"), col("n").as("n_days"),
      round(ssb / (col("k") - 1), 4).as("ms_between"),
      round(ssw / (col("n") - col("k")), 4).as("ms_within"),
      when(ssw > 0, round((ssb / (col("k") - 1)) /
        (ssw / (col("n") - col("k"))), 4)).as("w_stat"))
  }

  /** Cronbach's alpha over the five per-user engagement "items" (one
    * count per event type): do the activity channels move together
    * enough to justify q242-style composite engagement scores (alpha
    * ≥ 0.7 is the conventional bar for summing items into one
    * feature). One conditional aggregate builds the user×item count
    * frame; every item and total variance comes from EXACT integer
    * sums/sums-of-squares (counts), so alpha is a single fixed-order
    * float expression — engine-identical before its one rounding.
    */
  def q279_cronbach_alpha(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val u = t(s, dir, "events")
      .groupBy("user_id")
      .agg(types.map(tp =>
        sum(when(col("event_type") === tp, 1L).otherwise(0L)).as(s"c_$tp")).head,
        types.tail.map(tp =>
          sum(when(col("event_type") === tp, 1L).otherwise(0L)).as(s"c_$tp")): _*)
      .withColumn("tot", types.map(tp => col(s"c_$tp")).reduce(_ + _))
    val moments = Seq(sum("tot").as("st"), sum(col("tot") * col("tot")).as("qt")) ++
      types.flatMap(tp => Seq(
        sum(col(s"c_$tp")).as(s"s_$tp"),
        sum(col(s"c_$tp") * col(s"c_$tp")).as(s"q_$tp")))
    val a = u.agg(count(lit(1)).as("n"), moments: _*)
    def sv(sc: Column, qc: Column) =
      (qc - sc * sc / col("n")) / (col("n") - 1)
    val itemVarSum = types.map(tp => sv(col(s"s_$tp"), col(s"q_$tp"))).reduce(_ + _)
    val totVar = sv(col("st"), col("qt"))
    a.select(col("n").as("n_users"), lit(5L).as("k"),
      round(lit(5.0) / 4.0 * (lit(1.0) - itemVarSum / totVar), 4).as("alpha"))
  }

  /** Tukey-fence outlier census on daily revenue: Q1/Q3 picked by
    * EXACT rank (type-1 quantiles — actual data values, never
    * interpolated floats), fences at 1.5·IQR, and the count of days
    * beyond each fence — the box-plot numbers behind q109's
    * MAD-based flags, over the calendar-bounded day frame. Quartile
    * rows ride in as 1-row broadcast selections; the fence
    * comparisons and counts are exact.
    */
  def q280_tukey_fences(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val ranked = daily
      .withColumn("r", row_number().over(Window.orderBy("rev", "day")).cast("long"))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("nn"))))
    val q1 = ranked.filter(col("r") === ceil(col("nn") / 4.0))
      .select(col("rev").as("q1"))
    val q3 = ranked.filter(col("r") === ceil(col("nn") * 3 / 4.0))
      .select(col("rev").as("q3"))
    daily.crossJoin(broadcast(q1)).crossJoin(broadcast(q3))
      .agg(count(lit(1)).as("n_days"), first(col("q1")).as("q1x"),
        first(col("q3")).as("q3x"),
        sum(when(col("rev") < col("q1") - (col("q3") - col("q1")) * 1.5, 1L)
          .otherwise(0L)).as("n_low"),
        sum(when(col("rev") > col("q3") + (col("q3") - col("q1")) * 1.5, 1L)
          .otherwise(0L)).as("n_high"))
      .select(col("n_days"), col("q1x").as("q1"), col("q3x").as("q3"),
        col("n_low"), col("n_high"))
  }

  /** Sample-ratio-mismatch check for the q90 hash split: does the
    * observed train/holdout user allocation match the designed 80/20
    * within chi-square tolerance — the FIRST health check any A/B or
    * split pipeline runs (a mismatched ratio invalidates every
    * downstream readout before effect sizes are even looked at).
    * One distinct-user aggregate; chi² = Σ(obs−exp)²/exp over the two
    * cells in exact arithmetic until the final division.
    */
  def q290_srm_check(s: SparkSession, dir: String): DataFrame = {
    val inTrain =
      pmod(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)), lit(100L)) < 80
    val u = t(s, dir, "events").select(col("user_id")).distinct()
      .agg(sum(when(inTrain, 1L).otherwise(0L)).as("nt"),
        sum(when(inTrain, 0L).otherwise(1L)).as("nc"))
    val n = col("nt") + col("nc")
    val et = n * 0.8; val ec = n * 0.2
    u.select(col("nt"), col("nc"),
      round(et, 2).as("expected_t"), round(ec, 2).as("expected_c"),
      round((col("nt") - et) * (col("nt") - et) / et +
        (col("nc") - ec) * (col("nc") - ec) / ec, 4).as("chi2"),
      // 3.841 = chi-square(1 df) at alpha 0.05 — the standard SRM gate
      ((col("nt") - et) * (col("nt") - et) / et +
        (col("nc") - ec) * (col("nc") - ec) / ec > 3.841).as("srm_detected"))
  }

  /** Effective sample size of the daily purchase-count series: ESS =
    * n/(1 + 2Σρ₁..₇) — how many INDEPENDENT observations the
    * autocorrelated series is worth, the correction every
    * daily-metric confidence interval silently needs (q233's
    * bootstrap and q220's z both assume independence; this measures
    * how wrong that is). The seven lag covariances come from q234's
    * one-pass day-grain lag windows against a 1-row broadcast mean;
    * each ρ is one division and ESS one fixed-order expression,
    * rounded once each.
    */
  def q298_effective_n(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val mDf = daily.agg(count(lit(1)).as("n"),
      (sum("x") / count(lit(1))).as("mu"))
    val wo = Window.orderBy("day")
    val dev = daily.crossJoin(broadcast(mDf))
      .withColumn("d0", col("x") - col("mu"))
    val withLags = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"d$k", lag("d0", k).over(wo))
    }
    val aggs = Seq(sum(col("d0") * col("d0")).as("den")) ++
      (1 to 7).map(k => sum(col("d0") * col(s"d$k")).as(s"num$k"))
    val agg = withLags.agg(first(col("n")).as("n"), aggs: _*)
    val rhoSum = (1 to 7).map(k => col(s"num$k") / col("den")).reduce(_ + _)
    agg.select(col("n").as("n_days"),
      round(rhoSum, 6).as("rho_sum_1_7"),
      round(col("n") / (lit(1.0) + lit(2.0) * rhoSum), 2).as("ess"))
  }

  /** Cohen's kappa for the q21 language-ID heuristic against the
    * tagged labels: chance-corrected agreement — raw accuracy flatters
    * any classifier on a skewed label mix, kappa subtracts the
    * marginal-product agreement a label-blind guesser gets for free
    * (the standard single-number classifier audit next to q207's
    * per-feature view). Confusion cells, both marginals, and the
    * diagonal are exact counts (languages are a bounded dimension);
    * p_o, p_e, and kappa are fixed-order divisions rounded once each.
    */
  def q299_cohen_kappa(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val preds = tWide(s, dir, "documents")
      .select(col("lang").as("y"),
        TextFunctions.languageId(TextFunctions.tokens(col("text"))).as("p"))
    val cells = preds.groupBy("y", "p").agg(count(lit(1)).as("c"))
    val ry = cells.groupBy("y").agg(sum("c").as("ny"))
    val cp = cells.groupBy("p").agg(sum("c").as("np"))
    val tot = cells.agg(sum("c").as("n"),
      sum(when(col("y") === col("p"), col("c")).otherwise(0L)).as("na"))
    val pe = ry.join(cp, ry("y") === cp("p"))
      .crossJoin(broadcast(tot))
      .agg(sum(col("ny") * col("np") / (col("n") * col("n"))).as("pe"))
    val po = col("na") / col("n")
    tot.crossJoin(broadcast(pe))
      .select(col("n").as("n_docs"),
        round(po, 6).as("accuracy"),
        round(col("pe"), 6).as("chance_agreement"),
        when(col("pe") < 1,
          round((po - col("pe")) / (lit(1.0) - col("pe")), 4)).as("kappa"))
  }

  /** Benjamini-Hochberg FDR control over q207's per-token chi-square
    * screen — the multiple-testing correction a few-thousand-token
    * selection NEEDS (at α=0.05, 5% of a null vocabulary passes the
    * raw test by chance). The step-up boundary is evaluated on the
    * LOG scale (chi2_r ≥ −2·ln(r·α/m) ⟺ p_r ≤ r·α/m for the 1-df
    * upper-tail surrogate p = exp(−χ²/2)) so no cross-engine exp() of
    * tiny p-values enters the compare; ranks come from the cost-based
    * PrefixSum.globalRank over the vocab frame (never corpus rows,
    * never a mandatory single-partition sort) and chi2 is in DOUBLE from
    * the start — the all-integer numerator overflows int64 once doc
    * counts reach ~50k. Output is the one-row audit: tokens tested,
    * BH rejections vs the (always ≤) Bonferroni count, and the
    * realized chi-square cutoff.
    */
  def q302_fdr_bh(s: SparkSession, dir: String): DataFrame = {
    val alpha = 0.05
    // ONE documents scan: the doc-grain (id, lang, tokens) frame is
    // persisted and feeds BOTH the presence explode and the corpus
    // totals (each previously re-scanned + re-tokenized the corpus).
    val docs0 = tWide(s, dir, "documents")
      .select(col("lang"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .persistTracked()
    // Presence = "word appears in doc": dedup WITHIN each doc map-side
    // (array_distinct before the explode) so no global DISTINCT
    // shuffle exists at all — the only wide exchange left is the
    // word-keyed aggregate, and it partial-aggregates map-side.
    val pres = docs0
      .select((col("lang") === "en").cast("long").as("is_en"),
        explode(array_distinct(col("toks"))).as("word"))
    val tot = docs0
      .agg(sum((col("lang") === "en").cast("long")).as("n_en"),
        sum((col("lang") =!= "en").cast("long")).as("n_oth"))
    val adbc = col("a") * (col("n_oth") - col("b")) - col("b") * (col("n_en") - col("a"))
    val scored = pres.groupBy("word")
      .agg(sum("is_en").cast("double").as("a"), sum(lit(1L) - col("is_en")).cast("double").as("b"))
      .filter(col("a") + col("b") >= 5)
      .crossJoin(broadcast(tot.select(col("n_en").cast("double").as("n_en"),
        col("n_oth").cast("double").as("n_oth"))))
      .filter(col("a") + col("b") < col("n_en") + col("n_oth"))
      .withColumn("chi2",
        ((col("n_en") + col("n_oth")) * adbc * adbc) /
          ((col("a") + col("b")) * (col("n_en") + col("n_oth") - col("a") - col("b")) *
            col("n_en") * col("n_oth")))
      .select(col("word"), col("chi2"))
      // Persisted: consumed by BOTH the rank leg and the m_tested
      // count — without the cache each leg re-runs the presence
      // explode + vocab shuffle. Vocab-grain (df>=5-floored), so the
      // cache is small; released (with docs0) via CacheRegistry after
      // the caller's terminal action.
      .persistTracked()
    // Rank by descending chi2 via PrefixSum.globalRank on (−chi2, word)
    // — the tested vocabulary is df≥5-floored but still corpus-derived,
    // so the rank must not mandate a single-partition sort of it.
    val ranked = PrefixSum
      .globalRank(scored.withColumn("__nc", -col("chi2")), Seq("__nc", "word"), "r")
      .drop("__nc")
    val mrow = scored.agg(count(lit(1)).as("m_tested"))
    ranked.crossJoin(broadcast(mrow))
      .withColumn("bh_pass",
        (col("chi2") >= lit(-2.0) * log(col("r") * lit(alpha) / col("m_tested"))).cast("long"))
      .withColumn("bonf_pass",
        (col("chi2") >= lit(-2.0) * log(lit(alpha) / col("m_tested"))).cast("long"))
      .agg(first("m_tested").as("m_tested"),
        coalesce(max(when(col("bh_pass") === 1L, col("r"))), lit(0L)).as("n_bh"),
        sum("bonf_pass").as("n_bonferroni"),
        round(coalesce(min(when(col("bh_pass") === 1L, col("chi2"))), lit(0.0)), 4)
          .as("chi2_cutoff"))
  }

  /** Kruskal-Wallis H across the seven weekdays — the k-group
    * extension of q261's Mann-Whitney (rank-based one-way ANOVA: does
    * ANY weekday's purchase-value distribution differ, without
    * q259's normality assumption). Reuses the doubled-tie-averaged
    * rank trick: observations tied at a value hold ranks
    * cum−cnt+1..cum, so twice their average rank is the exact integer
    * 2·cum−cnt+1, and every per-group rank sum stays in int64 until
    * the one final H evaluation. Tie correction 1 − Σ(t³−t)/(N³−N)
    * applied as in Conover. Ranks ride on [[PrefixSum.runningTotal]]
    * over the DISTINCT-value frame — never a corpus-sized window.
    */
  def q308_kruskal_wallis(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val byVw = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("wd", dayofweek(col("ts")).cast("long"))
      .groupBy("value", "wd").agg(count(lit(1)).as("nv"))
    val byV = byVw.groupBy("value").agg(sum("nv").as("cnt"))
    val c = PrefixSum.runningTotal(byV, "value", "cnt", "cum")
    val r2 = col("cum") * 2 - col("cnt") + 1
    val ranked = byVw.join(c.select(col("value"), col("cnt"), r2.as("r2")), "value")
    val perG = ranked.groupBy("wd")
      .agg(sum("nv").as("n_g"), sum(col("nv") * col("r2")).as("r2g"))
    val tot = c.agg(sum("cnt").as("n"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"))
    val h = perG.crossJoin(broadcast(tot))
      .agg(first("n").as("n"), first("tie3").as("tie3"),
        sum((col("r2g") / 2.0) * (col("r2g") / 2.0) / col("n_g")).as("sr"))
      .select(col("n"), col("tie3"),
        (lit(12.0) / (col("n") * (col("n") + 1)) * col("sr") -
          lit(3.0) * (col("n") + 1)).as("h_raw"))
      .select(col("n").as("n_total"), round(col("h_raw"), 4).as("h"),
        round(col("h_raw") /
          (lit(1.0) - col("tie3") / (col("n") * col("n") * col("n") - col("n"))), 4)
          .as("h_tie_corrected"))
    perG.crossJoin(broadcast(tot))
      .select(col("wd"), col("n_g"),
        round(col("r2g") / (lit(2.0) * col("n_g")), 4).as("mean_rank"))
      .crossJoin(broadcast(h))
      .orderBy("wd")
  }

  /** Simpson's-paradox audit: the OLS slope of quantity ~ discount
    * pooled over all lineitems vs within each return-flag stratum —
    * the aggregation-bias check behind every "metric moved" readout
    * (a pooled trend whose sign flips inside every stratum is a
    * composition effect, not a behavior change; q267 audits split
    * BALANCE, this audits split CONFOUNDING). Slopes are the exact
    * closed form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from one
    * map-side-combined moment aggregate per grain; the pooled moment
    * row rides in as a 1-row broadcast.
    */
  def q310_simpson_audit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        col("l_discount").as("x"), col("l_quantity").as("y"))
    def slope(nc: Column, sx: Column, sy: Column, sxy: Column, sxx: Column): Column =
      (nc * sxy - sx * sy) / (nc * sxx - sx * sx)
    val moments = li.groupBy("grp").agg(
      count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val pooled = moments.agg(
      sum("n").as("pn"), sum("sx").as("psx"), sum("sy").as("psy"),
      sum("sxy").as("psxy"), sum("sxx").as("psxx"))
    moments.crossJoin(broadcast(pooled))
      .select(col("grp"), col("n").cast("long").as("n_rows"),
        round(slope(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")), 6)
          .as("slope_group"),
        round(slope(col("pn"), col("psx"), col("psy"), col("psxy"), col("psxx")), 6)
          .as("slope_pooled"),
        (slope(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")) *
          slope(col("pn"), col("psx"), col("psy"), col("psxy"), col("psxx")) < 0)
          .as("sign_flip"))
      .orderBy("grp")
  }

  /** A/B sample-size planner: per event type, the observations PER ARM
    * needed to detect a 5% relative lift of the mean at α=0.05
    * two-sided, 80% power — the design-time companion to q220's
    * after-the-fact z readout (and the number q290's SRM gate assumes
    * someone computed). n = ⌈(z_α/2 + z_β)² · 2σ²/Δ²⌉ with the two z
    * constants pinned as literals (1.96, 0.84) so no inverse-normal
    * enters the hash-compared path; σ² and μ come from one
    * moment aggregate over the historical stream.
    */
  def q311_abtest_power(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_obs"), avg("value").as("mu"),
        var_samp(col("value")).as("s2"))
    m.select(col("event_type"), col("n_obs"),
        round(col("mu"), 4).as("mean_value"),
        round(sqrt(col("s2")), 4).as("sd_value"),
        ceil((lit(1.96) + lit(0.84)) * (lit(1.96) + lit(0.84)) * lit(2.0) * col("s2") /
          ((lit(0.05) * col("mu")) * (lit(0.05) * col("mu")))).cast("long")
          .as("n_per_arm"))
      .orderBy("event_type")
  }

  /** Cramér's V (with the Bergsma bias correction) for event type ×
    * weekday — the bounded [0,1] association STRENGTH completing the
    * contingency kit: q126 says whether the dependence is significant,
    * q285 says how many nats it carries, V says how strong it is on a
    * scale comparable across tables of different size and shape (raw
    * φ² inflates on small n / large tables — the correction subtracts
    * its expectation under independence). Bounded contingency cells,
    * marginals as broadcasts, one final row of arithmetic.
    *
    * The chi-square sum runs over the COMPLETED r x c grid (distinct
    * event types crossed with distinct weekdays, observed cells
    * left-joined in, absent cells coalesced to 0): an empty cell still
    * contributes (0 - E)^2 / E = E, which observed-cells-only
    * enumeration would silently drop, understating the statistic
    * whenever the table is sparse (the q203 broadcast-grid pattern).
    */
  def q313_cramers_v(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events")
      .select(col("event_type").as("et"), dayofweek(col("ts")).cast("long").as("wd"))
    val obs = base.groupBy("et", "wd").agg(count(lit(1)).cast("double").as("o"))
    // Bounded r x c frame (#event_types x 7) — safe to cross however big `events` is.
    val grid = obs.select("et").distinct().crossJoin(broadcast(obs.select("wd").distinct()))
    val cells = grid.join(obs, Seq("et", "wd"), "left")
      .select(col("et"), col("wd"), coalesce(col("o"), lit(0.0)).as("o"))
    val mx = cells.groupBy("et").agg(sum("o").as("nx"))
    val my = cells.groupBy("wd").agg(sum("o").as("ny"))
    val dims = cells.agg(countDistinct("et").cast("double").as("r"),
      countDistinct("wd").cast("double").as("c"), sum("o").as("n"))
    val chi2 = cells
      .join(broadcast(mx), "et").join(broadcast(my), "wd")
      .crossJoin(broadcast(dims))
      .agg(first("r").as("r"), first("c").as("c"), first("n").as("n"),
        sum(((col("o") - col("nx") * col("ny") / col("n")) *
          (col("o") - col("nx") * col("ny") / col("n"))) /
          (col("nx") * col("ny") / col("n"))).as("chi2"))
    val phi2 = col("chi2") / col("n")
    val phi2c = greatest(lit(0.0),
      phi2 - (col("r") - 1) * (col("c") - 1) / (col("n") - 1))
    val rc = col("r") - (col("r") - 1) * (col("r") - 1) / (col("n") - 1)
    val cc = col("c") - (col("c") - 1) * (col("c") - 1) / (col("n") - 1)
    chi2.select(
      col("n").cast("long").as("n"), col("r").cast("long").as("n_types"),
      col("c").cast("long").as("n_weekdays"),
      round(col("chi2"), 4).as("chi2"),
      round(sqrt(phi2 / least(col("r") - 1, col("c") - 1)), 6).as("cramers_v"),
      round(sqrt(phi2c / least(rc - 1, cc - 1)), 6).as("v_bias_corrected"))
  }

  private[graft] def statsAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_quantiles"     -> (q40_quantiles _),
    "q66_value_histogram" -> (q66_value_histogram _),
    "q68_dim_stats"     -> (q68_dim_stats _),
    "q72_stats"         -> (q72_stats _),
    "q86_anomaly_zscore" -> (q86_anomaly_zscore _),
    "q93_equidepth_bins" -> (q93_equidepth_bins _),
    "q99_approx_quantiles" -> (q99_approx_quantiles _),
    "q102_corr_regression" -> (q102_corr_regression _),
    "q103_spearman"     -> (q103_spearman _),
    "q104_profile"      -> (q104_profile _),
    "q109_mad_outliers" -> (q109_mad_outliers _),
    "q114_winsorize"    -> (q114_winsorize _),
    "q126_chisq"        -> (q126_chisq _),
    "q138_decile_lift"  -> (q138_decile_lift _),
    "q206_ks_test"      -> (q206_ks_test _),
    "q220_ab_test"      -> (q220_ab_test _),
    "q226_kendall_tau"  -> (q226_kendall_tau _),
    "q228_mcnemar"      -> (q228_mcnemar _),
    "q233_bootstrap_ci" -> (q233_bootstrap_ci _),
    "q239_diff_in_diff" -> (q239_diff_in_diff _),
    "q240_exp_histogram" -> (q240_exp_histogram _),
    "q254_theil_sen"    -> (q254_theil_sen _),
    "q257_multivariate_outliers" -> (q257_multivariate_outliers _),
    "q259_anova_weekday" -> (q259_anova_weekday _),
    "q260_whale_curve"  -> (q260_whale_curve _),
    "q262_kaplan_meier" -> (q262_kaplan_meier _),
    "q263_psi_drift"    -> (q263_psi_drift _),
    "q265_tukey_hsd"    -> (q265_tukey_hsd _),
    "q267_covariate_balance" -> (q267_covariate_balance _),
    "q269_runs_test"    -> (q269_runs_test _),
    "q270_qq_deciles"   -> (q270_qq_deciles _),
    "q272_cohens_d"     -> (q272_cohens_d _),
    "q274_tost_equivalence" -> (q274_tost_equivalence _),
    "q275_hhi_concentration" -> (q275_hhi_concentration _),
    "q276_jarque_bera"  -> (q276_jarque_bera _),
    "q277_grubbs"       -> (q277_grubbs _),
    "q278_levene"       -> (q278_levene _),
    "q279_cronbach_alpha" -> (q279_cronbach_alpha _),
    "q280_tukey_fences" -> (q280_tukey_fences _),
    "q290_srm_check"    -> (q290_srm_check _),
    "q298_effective_n"  -> (q298_effective_n _),
    "q299_cohen_kappa"  -> (q299_cohen_kappa _),
    "q302_fdr_bh"       -> (q302_fdr_bh _),
    "q308_kruskal_wallis" -> (q308_kruskal_wallis _),
    "q310_simpson_audit" -> (q310_simpson_audit _),
    "q311_abtest_power" -> (q311_abtest_power _),
    "q313_cramers_v" -> (q313_cramers_v _),
  )

  private[graft] def statsOracle: Map[String, String] = Map(
    "q40_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = greatest(1, ceil(0.25 * n)) THEN l_extendedprice END) AS p25,
        |  max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN l_extendedprice END) AS p50,
        |  max(CASE WHEN rn = greatest(1, ceil(0.75 * n)) THEN l_extendedprice END) AS p75,
        |  max(CASE WHEN rn = greatest(1, ceil(0.95 * n)) THEN l_extendedprice END) AS p95
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q66_value_histogram" ->
      """WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
        |SELECT least(floor((value - mn) / ((mx - mn) / 20)), 19)::BIGINT AS bin,
        |  count(*) AS n
        |FROM events, s GROUP BY 1 ORDER BY bin""".stripMargin,
    "q68_dim_stats" ->
      """SELECT i AS dim, count(*) AS n,
        |  round(avg(embedding[i]::DOUBLE), 4) AS mean_x,
        |  round(min(embedding[i]::DOUBLE), 4) AS min_x,
        |  round(max(embedding[i]::DOUBLE), 4) AS max_x
        |FROM embeddings, range(1, 9) t(i)
        |GROUP BY i ORDER BY dim""".stripMargin,
    "q72_stats" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(value), 2) AS mean_v,
        |  round(stddev_samp(value), 2) AS sd_v,
        |  round(var_samp(value), 1) AS var_v,
        |  round(min(value), 2) AS min_v,
        |  round(max(value), 2) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q86_anomaly_zscore" ->
      """WITH st AS (
        |  SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY user_id)
        |SELECT event_type, count(*) AS n_outliers,
        |  round(sum(value), 2) AS sum_outlier_value
        |FROM events JOIN st USING (user_id)
        |WHERE sd IS NOT NULL AND abs(value - mu) > 2 * sd
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q93_equidepth_bins" ->
      """WITH r AS (
        |  SELECT l_extendedprice,
        |    ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
        |                    l_linenumber) AS bin
        |  FROM lineitem)
        |SELECT bin, count(*) AS n, round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM r GROUP BY bin ORDER BY bin""".stripMargin,
    "q102_corr_regression" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_s,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_p,
        |  round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q103_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS rq,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |      + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 AS rp
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n, round(corr(rq, rp), 4) AS spearman
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q104_profile" ->
      """SELECT 'l_discount' AS "column", count(l_discount) AS n_nonnull,
        |  sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |  count(DISTINCT l_discount) AS n_distinct,
        |  round(min(l_discount), 2) AS min_v, round(max(l_discount), 2) AS max_v,
        |  round(avg(l_discount), 4) AS avg_v
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(l_extendedprice),
        |  sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT l_extendedprice),
        |  round(min(l_extendedprice), 2), round(max(l_extendedprice), 2),
        |  round(avg(l_extendedprice), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(l_quantity),
        |  sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT l_quantity),
        |  round(min(l_quantity), 2), round(max(l_quantity), 2),
        |  round(avg(l_quantity), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_tax', count(l_tax),
        |  sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT l_tax),
        |  round(min(l_tax), 2), round(max(l_tax), 2), round(avg(l_tax), 4)
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,
    "q109_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, abs(value - med) AS ad, med
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  round(min(med), 4) AS median, round(min(mad), 4) AS mad,
        |  count(*) FILTER (ad > 4.4478 * mad) AS n_outliers
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "q114_winsorize" ->
      """WITH v AS (SELECT l_returnflag AS flag, l_extendedprice AS v FROM lineitem),
        |r AS (SELECT flag, v,
        |        row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY flag) AS n FROM v),
        |s AS (SELECT flag,
        |        max(CASE WHEN rn = greatest(1, ceil(0.05 * n)) THEN v END) AS lo,
        |        max(CASE WHEN rn = greatest(1, ceil(0.95 * n)) THEN v END) AS hi
        |      FROM r GROUP BY flag)
        |SELECT v.flag AS l_returnflag, count(*) AS n,
        |  round(avg(greatest(least(v.v, s.hi), s.lo)), 2) AS wins_mean,
        |  round(avg(v.v), 2) AS raw_mean
        |FROM v JOIN s ON v.flag = s.flag
        |GROUP BY v.flag ORDER BY l_returnflag""".stripMargin,
    "q126_chisq" ->
      """WITH obs AS (
        |  SELECT event_type, user_id % 3 AS cohort, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |cells AS (SELECT g.event_type, g.cohort, coalesce(o.n, 0) AS n
        |  FROM (SELECT event_type, cohort
        |        FROM (SELECT DISTINCT event_type FROM obs),
        |             (SELECT DISTINCT cohort FROM obs)) g
        |  LEFT JOIN obs o
        |    ON g.event_type = o.event_type AND g.cohort = o.cohort),
        |rt AS (SELECT event_type, sum(n)::BIGINT AS r FROM cells GROUP BY 1),
        |ct AS (SELECT cohort, sum(n)::BIGINT AS c FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT AS t FROM cells)
        |SELECT event_type, cohort, n,
        |  round((r * c) / t, 4) AS expected,
        |  round((n - (r * c) / t) * (n - (r * c) / t) / ((r * c) / t), 4)
        |    AS chi2_contrib
        |FROM cells JOIN rt USING (event_type) JOIN ct USING (cohort), tot
        |ORDER BY event_type, cohort""".stripMargin,
    "q138_decile_lift" ->
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice) * 100, 0)::BIGINT AS cents
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT cents,
        |    ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
        |  FROM spend),
        |agg AS (
        |  SELECT decile, count(*) AS n_customers, sum(cents)::BIGINT AS cents
        |  FROM d GROUP BY decile)
        |SELECT decile, n_customers, cents,
        |  (sum(cents) OVER (ORDER BY decile DESC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000
        |   // sum(cents) OVER ())::BIGINT AS cum_share_bp
        |FROM agg ORDER BY decile""".stripMargin,
    "q206_ks_test" ->
      """WITH g AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS na_v,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS nb_v
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value),
        |c AS (SELECT value,
        |    sum(na_v) OVER (ORDER BY value)::BIGINT AS ca,
        |    sum(nb_v) OVER (ORDER BY value)::BIGINT AS cb FROM g),
        |tot AS (SELECT sum(na_v)::BIGINT AS na, sum(nb_v)::BIGINT AS nb FROM g)
        |SELECT value, na, nb,
        |  round(abs(ca::DOUBLE / na - cb::DOUBLE / nb), 6) AS ks_d
        |FROM c, tot
        |ORDER BY abs(ca::DOUBLE / na - cb::DOUBLE / nb) DESC, value ASC
        |LIMIT 1""".stripMargin,
    "q220_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180
        |             THEN 1 ELSE 0 END)::BIGINT AS conv,
        |    (user_id % 2)::INTEGER AS arm
        |  FROM events GROUP BY user_id),
        |cells AS (SELECT
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS c0,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT AS c1
        |  FROM u)
        |SELECT n0, c0, n1, c1,
        |  round(c0::DOUBLE / n0, 4) AS p0,
        |  round(c1::DOUBLE / n1, 4) AS p1,
        |  round((c0::DOUBLE / n0 - c1::DOUBLE / n1) /
        |    sqrt(((c0 + c1)::DOUBLE / (n0 + n1)) * (1 - (c0 + c1)::DOUBLE / (n0 + n1))
        |         * (1.0 / n0 + 1.0 / n1)), 4) AS z
        |FROM cells""".stripMargin,
    "q226_kendall_tau" ->
      """WITH topc AS (
        |  SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |    sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS cents
        |  FROM orders GROUP BY o_custkey
        |  ORDER BY cents DESC, o_custkey ASC LIMIT 100),
        |pairs AS (
        |  SELECT sign(a.n_orders - b.n_orders) AS sx, sign(a.cents - b.cents) AS sy
        |  FROM topc a JOIN topc b ON a.o_custkey < b.o_custkey),
        |cells AS (SELECT
        |    sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)::BIGINT AS concordant,
        |    sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)::BIGINT AS discordant,
        |    sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)::BIGINT AS ties_x,
        |    sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)::BIGINT AS ties_y
        |  FROM pairs)
        |SELECT concordant, discordant, ties_x, ties_y,
        |  round((concordant - discordant)::DOUBLE /
        |    sqrt((concordant + discordant + ties_x)
        |         * (concordant + discordant + ties_y)), 4) AS tau_b
        |FROM cells""".stripMargin,
    "q228_mcnemar" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180
        |             AND ts < TIMESTAMP '2024-01-16 00:00:00'
        |             THEN 1 ELSE 0 END)::BIGINT AS early,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180
        |             AND ts >= TIMESTAMP '2024-01-16 00:00:00'
        |             THEN 1 ELSE 0 END)::BIGINT AS late
        |  FROM events GROUP BY user_id),
        |cells AS (SELECT
        |    sum(CASE WHEN early = 1 AND late = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN early = 0 AND late = 1 THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM u)
        |SELECT b, c, round((b - c) * (b - c)::DOUBLE / (b + c), 4) AS chi2
        |FROM cells""".stripMargin,
    "q233_bootstrap_ci" ->
      """WITH pu AS (
        |  SELECT user_id, sum(round(value * 100, 0)::BIGINT)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |reps AS (SELECT r AS rep FROM generate_series(0, 99) AS t(r)),
        |wts AS (SELECT rep, cents,
        |    CASE WHEN u < 0.3679 THEN 0 WHEN u < 0.7358 THEN 1
        |         WHEN u < 0.9197 THEN 2 WHEN u < 0.9810 THEN 3 ELSE 4 END::BIGINT AS w
        |  FROM (SELECT rep, cents,
        |      ('0x' || substr(md5(user_id::VARCHAR || '|' || rep::VARCHAR), 1, 8))::BIGINT
        |        / 4294967296.0 AS u
        |    FROM pu, reps)),
        |means AS (SELECT rep,
        |    sum(w * cents)::DOUBLE / (sum(w) * 100.0) AS mean_spend
        |  FROM wts GROUP BY rep),
        |ranked AS (SELECT *,
        |    row_number() OVER (ORDER BY mean_spend ASC, rep ASC) AS rk FROM means)
        |SELECT count(*)::BIGINT AS n_reps,
        |  round(avg(mean_spend), 2) AS boot_mean,
        |  round(max(CASE WHEN rk = 3 THEN mean_spend END), 2) AS ci_lo,
        |  round(max(CASE WHEN rk = 98 THEN mean_spend END), 2) AS ci_hi
        |FROM ranked""".stripMargin,
    "q239_diff_in_diff" ->
      """WITH p AS (
        |  SELECT (user_id % 2 = 1)::INTEGER AS treated,
        |    (ts >= TIMESTAMP '2024-01-16 00:00:00')::INTEGER AS post,
        |    round(value * 100, 0)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |cells AS (SELECT
        |    sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS nt0,
        |    sum(CASE WHEN treated = 1 AND post = 0 THEN cents ELSE 0 END)::BIGINT AS st0,
        |    sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS nt1,
        |    sum(CASE WHEN treated = 1 AND post = 1 THEN cents ELSE 0 END)::BIGINT AS st1,
        |    sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS nc0,
        |    sum(CASE WHEN treated = 0 AND post = 0 THEN cents ELSE 0 END)::BIGINT AS sc0,
        |    sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS nc1,
        |    sum(CASE WHEN treated = 0 AND post = 1 THEN cents ELSE 0 END)::BIGINT AS sc1
        |  FROM p)
        |SELECT
        |  round(st0::DOUBLE / nt0 / 100.0, 4) AS treat_pre,
        |  round(st1::DOUBLE / nt1 / 100.0, 4) AS treat_post,
        |  round(sc0::DOUBLE / nc0 / 100.0, 4) AS ctrl_pre,
        |  round(sc1::DOUBLE / nc1 / 100.0, 4) AS ctrl_post,
        |  round((st1::DOUBLE / nt1 / 100.0 - st0::DOUBLE / nt0 / 100.0)
        |      - (sc1::DOUBLE / nc1 / 100.0 - sc0::DOUBLE / nc0 / 100.0), 4) AS did
        |FROM cells""".stripMargin,
    "q240_exp_histogram" ->
      """WITH c AS (
        |  SELECT round(value * 100, 0)::BIGINT AS cents FROM events
        |  WHERE event_type = 'purchase')
        |SELECT floor(log2(cents))::BIGINT AS bucket, count(*)::BIGINT AS n,
        |  min(cents)::BIGINT AS lo_cents, max(cents)::BIGINT AS hi_cents
        |FROM c WHERE cents >= 1
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q254_theil_sen" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS n,
        |    (ts::DATE - DATE '2024-01-01')::BIGINT AS d
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |slopes AS (SELECT a.d AS da, b.d AS db,
        |    (b.n - a.n)::DOUBLE / (b.d - a.d) AS slope
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |m AS (SELECT count(*)::BIGINT AS np FROM slopes),
        |r AS (SELECT slope, np,
        |    row_number() OVER (ORDER BY slope ASC, da ASC, db ASC) AS rk
        |  FROM slopes, m)
        |SELECT np AS n_pairs, round(slope, 4) AS theil_sen_slope
        |FROM r WHERE rk = (np + 1) // 2""".stripMargin,
    "q257_multivariate_outliers" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t <> ''))::BIGINT AS f1,
        |    length(text)::BIGINT AS f2,
        |    len(list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t <> '')))::BIGINT AS f3
        |  FROM documents),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(f1)::BIGINT AS s1, sum(f1 * f1)::BIGINT AS q1,
        |    sum(f2)::BIGINT AS s2, sum(f2 * f2)::BIGINT AS q2,
        |    sum(f3)::BIGINT AS s3, sum(f3 * f3)::BIGINT AS q3
        |  FROM base)
        |SELECT doc_id, f1, f2, f3,
        |  round(((f1 * n - s1) * (f1 * n - s1))::DOUBLE / (n * q1 - s1 * s1) +
        |        ((f2 * n - s2) * (f2 * n - s2))::DOUBLE / (n * q2 - s2 * s2) +
        |        ((f3 * n - s3) * (f3 * n - s3))::DOUBLE / (n * q3 - s3 * s3), 6)
        |    AS score
        |FROM base, m
        |ORDER BY score DESC, doc_id ASC LIMIT 15""".stripMargin,
    "q259_anova_weekday" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS n FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |dd AS (SELECT n, dayofweek(day)::BIGINT AS wd FROM daily),
        |g AS (SELECT wd, count(*)::BIGINT AS ng, sum(n)::BIGINT AS sg,
        |    sum(n * n)::BIGINT AS qg FROM dd GROUP BY wd),
        |tot AS (SELECT sum(ng)::BIGINT AS n, sum(sg)::BIGINT AS s,
        |    sum(qg)::BIGINT AS q, count(*)::BIGINT AS k FROM g),
        |parts AS (SELECT sum(sg * sg / ng) AS ssb_part FROM g)
        |SELECT k, n AS n_days,
        |  round((ssb_part - s * s / n) / (k - 1), 4) AS ms_between,
        |  round((q - ssb_part) / (n - k), 4) AS ms_within,
        |  CASE WHEN q - ssb_part > 0 THEN
        |    round(((ssb_part - s * s / n) / (k - 1)) /
        |          ((q - ssb_part) / (n - k)), 4) END AS f_stat
        |FROM tot, parts""".stripMargin,
    "q260_whale_curve" ->
      """WITH spend AS (
        |  SELECT user_id, sum(round(value * 100, 0)::BIGINT)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |t AS (SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS tot FROM spend),
        |r AS (SELECT cents,
        |    row_number() OVER (ORDER BY -cents ASC, user_id ASC)::BIGINT AS r
        |  FROM spend),
        |b AS (SELECT cents,
        |    CASE WHEN r <= (n % 10) * (n // 10 + 1)
        |         THEN (r - 1) // (n // 10 + 1)
        |         ELSE (n % 10) + (r - (n % 10) * (n // 10 + 1) - 1) // (n // 10)
        |    END + 1 AS decile
        |  FROM r, t),
        |d AS (SELECT decile, count(*)::BIGINT AS n_users, sum(cents)::BIGINT AS dc
        |  FROM b GROUP BY decile),
        |c AS (SELECT *, sum(dc) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_cents
        |  FROM d)
        |SELECT decile, n_users, round(dc / 100.0, 2) AS decile_spend,
        |  round(cum_cents::DOUBLE / tot, 4) AS cum_share
        |FROM c, t ORDER BY decile""".stripMargin,
    "q262_kaplan_meier" ->
      """WITH u AS (SELECT user_id, min(ts::DATE) AS fd,
        |    min(CASE WHEN event_type = 'purchase' THEN ts::DATE END) AS cd
        |  FROM events GROUP BY user_id),
        |l AS (SELECT
        |    CASE WHEN cd IS NOT NULL AND cd - fd <= 5 THEN cd - fd
        |         ELSE 5 END::BIGINT AS dur,
        |    (cd IS NOT NULL AND cd - fd <= 5) AS conv FROM u),
        |b AS (SELECT dur, count(*)::BIGINT AS ended,
        |    sum(CASE WHEN conv THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM l GROUP BY dur),
        |t AS (SELECT sum(ended)::BIGINT AS n_users FROM b),
        |c AS (SELECT *, sum(ended) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM b),
        |r AS (SELECT dur, d, n_users - cum + ended AS n_risk,
        |    CASE WHEN d > 0 AND d < n_users - cum + ended
        |         THEN ln(1 - d::DOUBLE / (n_users - cum + ended))
        |         ELSE 0 END AS lns FROM c, t),
        |s AS (SELECT *, sum(lns) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
        |  max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit0 FROM r)
        |SELECT dur AS t_days, n_risk, d AS deaths,
        |  CASE WHEN hit0 = 1 THEN 0.0 ELSE round(exp(cl), 4) END AS surv
        |FROM s WHERE d > 0 ORDER BY t_days""".stripMargin,
    "q263_psi_drift" ->
      """WITH p AS (SELECT ts::DATE AS day, value FROM events
        |           WHERE event_type = 'purchase'),
        |env AS (SELECT min(day) AS d0, max(day) AS d1,
        |    min(value) AS v0, max(value) AS v1 FROM p),
        |g AS (SELECT
        |    least(floor((value - v0) * 10.0 / (v1 - v0)), 9)::BIGINT AS bin,
        |    sum(CASE WHEN (day - d0) * 2 > (d1 - d0) THEN 0 ELSE 1 END)::BIGINT AS na,
        |    sum(CASE WHEN (day - d0) * 2 > (d1 - d0) THEN 1 ELSE 0 END)::BIGINT AS nb
        |  FROM p, env GROUP BY 1),
        |tot AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb FROM g)
        |SELECT bin, na, nb,
        |  round(((na + 0.5) / (ta + 5.0) - (nb + 0.5) / (tb + 5.0)) *
        |    ln(((na + 0.5) / (ta + 5.0)) / ((nb + 0.5) / (tb + 5.0))), 6) AS psi
        |FROM g, tot ORDER BY bin""".stripMargin,
    "q265_tukey_hsd" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS n FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |dd AS (SELECT n, (dayofweek(day) + 1)::BIGINT AS wd FROM daily),
        |g AS (SELECT wd, count(*)::BIGINT AS ng, sum(n)::BIGINT AS sg,
        |    sum(n * n)::BIGINT AS qg FROM dd GROUP BY wd),
        |m AS (SELECT (sum(qg) - sum(sg * sg / ng)) /
        |    (sum(ng) - count(*)) AS msw FROM g)
        |SELECT a.wd AS wd_a, b.wd AS wd_b,
        |  round(a.sg / a.ng - b.sg / b.ng, 4) AS mean_diff,
        |  round((a.sg / a.ng - b.sg / b.ng) /
        |    sqrt(msw / 2.0 * (1.0 / a.ng + 1.0 / b.ng)), 4) AS q_stat
        |FROM g a, g b, m WHERE a.wd < b.wd ORDER BY wd_a, wd_b""".stripMargin,
    "q267_covariate_balance" ->
      """WITH u AS (SELECT user_id,
        |    count(*)::DOUBLE AS f_events, sum(value) AS f_value,
        |    count(DISTINCT ts::DATE)::DOUBLE AS f_days,
        |    count(DISTINCT event_type)::DOUBLE AS f_types
        |  FROM events GROUP BY user_id),
        |ut AS (SELECT *, CASE WHEN ((user_id * 2654435761) % 4294967296)
        |    % 100 < 80 THEN 1 ELSE 0 END AS t FROM u),
        |m AS (
        |  SELECT t, 'active_days' AS feature, f_days AS x FROM ut UNION ALL
        |  SELECT t, 'n_events', f_events FROM ut UNION ALL
        |  SELECT t, 'n_types', f_types FROM ut UNION ALL
        |  SELECT t, 'total_value', f_value FROM ut),
        |g AS (SELECT feature,
        |    sum(t)::BIGINT AS nt,
        |    sum(CASE WHEN t = 1 THEN x END) AS st,
        |    sum(CASE WHEN t = 1 THEN x * x END) AS qt,
        |    sum(1 - t)::BIGINT AS nc,
        |    sum(CASE WHEN t = 0 THEN x END) AS sc,
        |    sum(CASE WHEN t = 0 THEN x * x END) AS qc
        |  FROM m GROUP BY feature)
        |SELECT feature, nt, nc,
        |  round(st / nt, 4) AS mean_t, round(sc / nc, 4) AS mean_c,
        |  CASE WHEN ((qt - st * st / nt) / (nt - 1) +
        |             (qc - sc * sc / nc) / (nc - 1)) / 2.0 > 0 THEN
        |    round((st / nt - sc / nc) /
        |      sqrt(((qt - st * st / nt) / (nt - 1) +
        |            (qc - sc * sc / nc) / (nc - 1)) / 2.0), 4) END AS smd
        |FROM g ORDER BY feature""".stripMargin,
    "q269_runs_test" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |ranked AS (SELECT *, row_number() OVER (ORDER BY rev, day)::BIGINT AS r
        |  FROM daily),
        |nn AS (SELECT count(*)::BIGINT AS nn FROM daily),
        |med AS (SELECT rev AS med FROM ranked, nn
        |        WHERE r = floor((nn + 1) / 2.0)),
        |sq AS (SELECT day, (rev > med)::BIGINT AS s FROM daily, med),
        |sq2 AS (SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM sq),
        |a AS (SELECT
        |    sum(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END)::BIGINT AS runs,
        |    sum(s)::BIGINT AS n1, sum(1 - s)::BIGINT AS n0 FROM sq2)
        |SELECT runs, n1, n0,
        |  CASE WHEN 2.0 * n1 * n0 * (2.0 * n1 * n0 - (n1 + n0)) /
        |      ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0)) > 0 THEN
        |    round((runs - (2.0 * n1 * n0 / (n1 + n0) + 1)) /
        |      sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - (n1 + n0)) /
        |        ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))), 4) END AS z
        |FROM a""".stripMargin,
    "q270_qq_deciles" ->
      """WITH p AS (SELECT event_id, value, dayofweek(ts) IN (0, 6) AS wk
        |  FROM events WHERE event_type = 'purchase'),
        |ra AS (SELECT value, row_number() OVER (ORDER BY value, event_id)::BIGINT AS r
        |  FROM p WHERE NOT wk),
        |na AS (SELECT count(*)::BIGINT AS n FROM ra),
        |da AS (SELECT CASE WHEN r <= (n % 10) * (n // 10 + 1)
        |      THEN (r - 1) // (n // 10 + 1)
        |      ELSE (n % 10) + (r - (n % 10) * (n // 10 + 1) - 1) // (n // 10)
        |    END + 1 AS decile, max(value) AS q_weekday
        |  FROM ra, na GROUP BY 1),
        |rb AS (SELECT value, row_number() OVER (ORDER BY value, event_id)::BIGINT AS r
        |  FROM p WHERE wk),
        |nb AS (SELECT count(*)::BIGINT AS n FROM rb),
        |db AS (SELECT CASE WHEN r <= (n % 10) * (n // 10 + 1)
        |      THEN (r - 1) // (n // 10 + 1)
        |      ELSE (n % 10) + (r - (n % 10) * (n // 10 + 1) - 1) // (n // 10)
        |    END + 1 AS decile, max(value) AS q_weekend
        |  FROM rb, nb GROUP BY 1)
        |SELECT decile, q_weekday, q_weekend,
        |  round(q_weekend - q_weekday, 2) AS gap
        |FROM da JOIN db USING (decile) ORDER BY decile""".stripMargin,
    "q272_cohens_d" ->
      """WITH a AS (SELECT
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1 END)::BIGINT AS n1,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN NULL ELSE value END) AS s1,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN NULL
        |        ELSE value * value END) AS q1,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN value END) AS s2,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN value * value END) AS q2
        |  FROM events WHERE event_type = 'purchase')
        |SELECT n1 AS n_weekday, n2 AS n_weekend,
        |  round(s1 / n1, 4) AS mean_weekday,
        |  round(s2 / n2, 4) AS mean_weekend,
        |  round((s1 / n1 - s2 / n2) /
        |    sqrt(((n1 - 1) * ((q1 - s1 * s1 / n1) / (n1 - 1)) +
        |          (n2 - 1) * ((q2 - s2 * s2 / n2) / (n2 - 1))) /
        |         (n1 + n2 - 2)), 4) AS cohens_d,
        |  round((s1 / n1 - s2 / n2) /
        |    sqrt(((n1 - 1) * ((q1 - s1 * s1 / n1) / (n1 - 1)) +
        |          (n2 - 1) * ((q2 - s2 * s2 / n2) / (n2 - 1))) /
        |         (n1 + n2 - 2)) *
        |    (1.0 - 3.0 / (4.0 * (n1 + n2) - 9)), 4) AS hedges_g
        |FROM a""".stripMargin,
    "q274_tost_equivalence" ->
      """WITH a AS (SELECT
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN 1 ELSE 0 END)::BIGINT AS nt,
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN value END) AS st,
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN value * value END) AS qt,
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN 0 ELSE 1 END)::BIGINT AS nc,
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN NULL ELSE value END) AS sc,
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN NULL ELSE value * value END) AS qc
        |  FROM events WHERE event_type = 'purchase')
        |SELECT nt, nc,
        |  round(st / nt, 4) AS mean_train, round(sc / nc, 4) AS mean_holdout,
        |  round(sc / nc * 0.05, 4) AS margin,
        |  round((st / nt - sc / nc + sc / nc * 0.05) /
        |    sqrt((qt - st * st / nt) / (nt - 1) / nt +
        |         (qc - sc * sc / nc) / (nc - 1) / nc), 4) AS z_lower,
        |  round((st / nt - sc / nc - sc / nc * 0.05) /
        |    sqrt((qt - st * st / nt) / (nt - 1) / nt +
        |         (qc - sc * sc / nc) / (nc - 1) / nc), 4) AS z_upper,
        |  ((st / nt - sc / nc + sc / nc * 0.05) /
        |    sqrt((qt - st * st / nt) / (nt - 1) / nt +
        |         (qc - sc * sc / nc) / (nc - 1) / nc) > 1.645 AND
        |   (st / nt - sc / nc - sc / nc * 0.05) /
        |    sqrt((qt - st * st / nt) / (nt - 1) / nt +
        |         (qc - sc * sc / nc) / (nc - 1) / nc) < -1.645) AS equivalent
        |FROM a""".stripMargin,
    "q275_hhi_concentration" ->
      """WITH bn AS (SELECT r_name, n_name,
        |    sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |br AS (SELECT r_name, sum(cents)::BIGINT AS tot,
        |    count(*)::BIGINT AS n_nations FROM bn GROUP BY r_name)
        |SELECT r_name, n_nations,
        |  round(sum((cents / tot) * (cents / tot) * 10000), 2) AS hhi
        |FROM bn JOIN br USING (r_name)
        |GROUP BY r_name, n_nations ORDER BY r_name""".stripMargin,
    "q276_jarque_bera" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(rev) AS s1,
        |    sum(rev * rev) AS s2, sum(rev * rev * rev) AS s3,
        |    sum(rev * rev * rev * rev) AS s4 FROM daily),
        |b AS (SELECT n, s1 / n AS m, s2, s3, s4 FROM a),
        |c AS (SELECT n,
        |    s2 / n - m * m AS m2,
        |    s3 / n - m * (s2 / n) * 3 + m * m * m * 2 AS m3,
        |    s4 / n - m * (s3 / n) * 4 + m * m * (s2 / n) * 6
        |      - m * m * m * m * 3 AS m4 FROM b),
        |d AS (SELECT n, m3 / sqrt(m2 * m2 * m2) AS sk,
        |    m4 / (m2 * m2) AS ku FROM c)
        |SELECT n::BIGINT AS n_days, round(sk, 4) AS skewness,
        |  round(ku - 3, 4) AS excess_kurtosis,
        |  round(n / 6.0 * (sk * sk + (ku - 3) * (ku - 3) / 4.0), 4) AS jb
        |FROM d""".stripMargin,
    "q277_grubbs" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |mom AS (SELECT count(*)::DOUBLE AS n, sum(rev) AS s1,
        |    sum(rev * rev) AS s2 FROM daily)
        |SELECT n::BIGINT AS n_days, day, rev,
        |  round(abs(rev - s1 / n) /
        |    sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS g_stat
        |FROM daily, mom
        |ORDER BY abs(rev - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) DESC,
        |  day ASC LIMIT 1""".stripMargin,
    "q278_levene" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |dd AS (SELECT x, (dayofweek(day) + 1)::BIGINT AS wd FROM daily),
        |gm AS (SELECT wd, sum(x) / count(*) AS gmean FROM dd GROUP BY wd),
        |z AS (SELECT dd.wd, abs(x - gmean) AS z FROM dd JOIN gm USING (wd)),
        |g AS (SELECT wd, count(*)::BIGINT AS ng, sum(z) AS sg,
        |    sum(z * z) AS qg FROM z GROUP BY wd),
        |tot AS (SELECT sum(ng)::BIGINT AS n, sum(sg) AS s, sum(qg) AS q,
        |    count(*)::BIGINT AS k, sum(sg * sg / ng) AS ssb_part FROM g)
        |SELECT k, n AS n_days,
        |  round((ssb_part - s * s / n) / (k - 1), 4) AS ms_between,
        |  round((q - ssb_part) / (n - k), 4) AS ms_within,
        |  CASE WHEN q - ssb_part > 0 THEN
        |    round(((ssb_part - s * s / n) / (k - 1)) /
        |          ((q - ssb_part) / (n - k)), 4) END AS w_stat
        |FROM tot""".stripMargin,
    "q279_cronbach_alpha" ->
      """WITH u AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS c2,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c3,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS c4,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS c5,
        |    count(*)::BIGINT AS tot
        |  FROM events GROUP BY user_id),
        |a AS (SELECT count(*)::BIGINT AS n,
        |    sum(tot)::BIGINT AS st, sum(tot * tot)::BIGINT AS qt,
        |    sum(c1)::BIGINT AS s1, sum(c1 * c1)::BIGINT AS q1,
        |    sum(c2)::BIGINT AS s2, sum(c2 * c2)::BIGINT AS q2,
        |    sum(c3)::BIGINT AS s3, sum(c3 * c3)::BIGINT AS q3,
        |    sum(c4)::BIGINT AS s4, sum(c4 * c4)::BIGINT AS q4,
        |    sum(c5)::BIGINT AS s5, sum(c5 * c5)::BIGINT AS q5
        |  FROM u)
        |SELECT n AS n_users, 5::BIGINT AS k,
        |  round(5.0 / 4.0 * (1.0 -
        |    ((q1 - s1 * s1 / n) / (n - 1) + (q2 - s2 * s2 / n) / (n - 1) +
        |     (q3 - s3 * s3 / n) / (n - 1) + (q4 - s4 * s4 / n) / (n - 1) +
        |     (q5 - s5 * s5 / n) / (n - 1)) /
        |    ((qt - st * st / n) / (n - 1))), 4) AS alpha
        |FROM a""".stripMargin,
    "q280_tukey_fences" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |ranked AS (SELECT *, row_number() OVER (ORDER BY rev, day)::BIGINT AS r
        |  FROM daily),
        |nn AS (SELECT count(*)::BIGINT AS nn FROM daily),
        |q1 AS (SELECT rev AS q1 FROM ranked, nn WHERE r = ceil(nn / 4.0)),
        |q3 AS (SELECT rev AS q3 FROM ranked, nn WHERE r = ceil(nn * 3 / 4.0))
        |SELECT count(*)::BIGINT AS n_days, first(q1) AS q1, first(q3) AS q3,
        |  sum(CASE WHEN rev < q1 - (q3 - q1) * 1.5 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_low,
        |  sum(CASE WHEN rev > q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_high
        |FROM daily, q1, q3""".stripMargin,
    "q290_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN 1 ELSE 0 END)::BIGINT AS nt,
        |    sum(CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 80
        |        THEN 0 ELSE 1 END)::BIGINT AS nc
        |  FROM u)
        |SELECT nt, nc,
        |  round((nt + nc) * 0.8, 2) AS expected_t,
        |  round((nt + nc) * 0.2, 2) AS expected_c,
        |  round((nt - (nt + nc) * 0.8) * (nt - (nt + nc) * 0.8) /
        |      ((nt + nc) * 0.8) +
        |    (nc - (nt + nc) * 0.2) * (nc - (nt + nc) * 0.2) /
        |      ((nt + nc) * 0.2), 4) AS chi2,
        |  ((nt - (nt + nc) * 0.8) * (nt - (nt + nc) * 0.8) /
        |      ((nt + nc) * 0.8) +
        |    (nc - (nt + nc) * 0.2) * (nc - (nt + nc) * 0.2) /
        |      ((nt + nc) * 0.2) > 3.841) AS srm_detected
        |FROM a""".stripMargin,
    "q298_effective_n" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT AS n, sum(x) / count(*) AS mu FROM daily),
        |dv AS (SELECT day, x - mu AS d0 FROM daily, m),
        |lg AS (SELECT d0,
        |    lag(d0, 1) OVER w AS d1, lag(d0, 2) OVER w AS d2,
        |    lag(d0, 3) OVER w AS d3, lag(d0, 4) OVER w AS d4,
        |    lag(d0, 5) OVER w AS d5, lag(d0, 6) OVER w AS d6,
        |    lag(d0, 7) OVER w AS d7
        |  FROM dv WINDOW w AS (ORDER BY day)),
        |a AS (SELECT sum(d0 * d0) AS den,
        |    sum(d0 * d1) AS num1, sum(d0 * d2) AS num2, sum(d0 * d3) AS num3,
        |    sum(d0 * d4) AS num4, sum(d0 * d5) AS num5, sum(d0 * d6) AS num6,
        |    sum(d0 * d7) AS num7 FROM lg)
        |SELECT n AS n_days,
        |  round(num1 / den + num2 / den + num3 / den + num4 / den +
        |    num5 / den + num6 / den + num7 / den, 6) AS rho_sum_1_7,
        |  round(n / (1.0 + 2.0 * (num1 / den + num2 / den + num3 / den +
        |    num4 / den + num5 / den + num6 / den + num7 / den)), 2) AS ess
        |FROM a, m""".stripMargin,
    "q299_cohen_kappa" -> {
      val profiles = graft.functions.TextFunctions.stopwordProfiles
      def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      val hits = profiles.map { case (l, ws) =>
        s"len(list_distinct(list_intersect(toks, ${lst(ws)}))) AS h_$l"
      }.mkString(",\n        ")
      val bestExpr = profiles.map(p => s"h_${p._1}").mkString("greatest(", ", ", ")")
      val caseArms = profiles.map { case (l, _) =>
        s"WHEN h_$l = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH tok AS (
        |  SELECT lang AS y,
        |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |sc AS (SELECT y, $hits FROM tok),
        |pr AS (SELECT y, CASE $caseArms ELSE 'und' END AS p
        |  FROM (SELECT *, $bestExpr AS best FROM sc)),
        |cells AS (SELECT y, p, count(*)::BIGINT AS c FROM pr GROUP BY y, p),
        |ry AS (SELECT y, sum(c)::BIGINT AS ny FROM cells GROUP BY y),
        |cp AS (SELECT p, sum(c)::BIGINT AS np FROM cells GROUP BY p),
        |tot AS (SELECT sum(c)::BIGINT AS n,
        |    sum(CASE WHEN y = p THEN c ELSE 0 END)::BIGINT AS na FROM cells),
        |pe AS (SELECT sum(ny * np / (n * n)) AS pe
        |  FROM ry JOIN cp ON ry.y = cp.p, tot)
        |SELECT n AS n_docs, round(na / n, 6) AS accuracy,
        |  round(pe, 6) AS chance_agreement,
        |  CASE WHEN pe < 1 THEN round((na / n - pe) / (1.0 - pe), 4) END AS kappa
        |FROM tot, pe""".stripMargin
    },
    "q302_fdr_bh" ->
      """WITH pres AS (
        |  SELECT DISTINCT doc_id, is_en, word FROM (
        |    SELECT doc_id, (lang = 'en')::BIGINT AS is_en,
        |      unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents) WHERE word <> ''),
        |tot AS (SELECT sum((lang = 'en')::BIGINT)::DOUBLE AS n_en,
        |               sum((lang <> 'en')::BIGINT)::DOUBLE AS n_oth FROM documents),
        |scored AS (SELECT word,
        |    ((n_en + n_oth) * (a * (n_oth - b) - b * (n_en - a))
        |       * (a * (n_oth - b) - b * (n_en - a))) /
        |      ((a + b) * (n_en + n_oth - a - b) * n_en * n_oth) AS chi2
        |  FROM (SELECT word, sum(is_en)::DOUBLE AS a, sum(1 - is_en)::DOUBLE AS b
        |        FROM pres GROUP BY word HAVING sum(is_en) + sum(1 - is_en) >= 5) g,
        |       tot
        |  WHERE a + b < n_en + n_oth),
        |mr AS (SELECT count(*)::BIGINT AS m_tested FROM scored),
        |ranked AS (SELECT chi2,
        |    row_number() OVER (ORDER BY chi2 DESC, word ASC)::BIGINT AS r
        |  FROM scored)
        |SELECT m_tested,
        |  coalesce(max(CASE WHEN chi2 >= -2.0 * ln(r * 0.05 / m_tested)
        |    THEN r END), 0)::BIGINT AS n_bh,
        |  sum(CASE WHEN chi2 >= -2.0 * ln(0.05 / m_tested)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_bonferroni,
        |  round(coalesce(min(CASE WHEN chi2 >= -2.0 * ln(r * 0.05 / m_tested)
        |    THEN chi2 END), 0.0), 4) AS chi2_cutoff
        |FROM ranked, mr GROUP BY m_tested""".stripMargin,
    "q308_kruskal_wallis" ->
      """WITH p AS (SELECT value, dayofweek(ts)::BIGINT + 1 AS wd FROM events
        |  WHERE event_type = 'purchase'),
        |byvw AS (SELECT value, wd, count(*)::BIGINT AS nv FROM p GROUP BY 1, 2),
        |byv AS (SELECT value, sum(nv)::BIGINT AS cnt FROM byvw GROUP BY 1),
        |c AS (SELECT value, cnt,
        |    sum(cnt) OVER (ORDER BY value)::BIGINT AS cum FROM byv),
        |ranked AS (SELECT byvw.value, wd, nv, cnt,
        |    (cum * 2 - cnt + 1)::BIGINT AS r2
        |  FROM byvw JOIN c ON byvw.value = c.value),
        |perg AS (SELECT wd, sum(nv)::BIGINT AS n_g,
        |    sum(nv * r2)::BIGINT AS r2g FROM ranked GROUP BY wd),
        |tot AS (SELECT sum(cnt)::BIGINT AS n,
        |    sum(cnt * cnt * cnt - cnt)::BIGINT AS tie3 FROM c),
        |h AS (SELECT n AS n_total, round(h_raw, 4) AS h,
        |    round(h_raw / (1.0 - tie3 / (n * n * n - n)::DOUBLE), 4)
        |      AS h_tie_corrected
        |  FROM (SELECT n, tie3,
        |      12.0 / (n * (n + 1)) *
        |        sum((r2g / 2.0) * (r2g / 2.0) / n_g) - 3.0 * (n + 1) AS h_raw
        |    FROM perg, tot GROUP BY n, tie3))
        |SELECT wd, n_g, round(r2g / (2.0 * n_g), 4) AS mean_rank,
        |  n_total, h, h_tie_corrected
        |FROM perg, h ORDER BY wd""".stripMargin,
    "q310_simpson_audit" ->
      """WITH m AS (SELECT l_returnflag AS grp, count(*)::DOUBLE AS n,
        |    sum(l_discount) AS sx, sum(l_quantity) AS sy,
        |    sum(l_discount * l_quantity) AS sxy,
        |    sum(l_discount * l_discount) AS sxx
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT sum(n) AS pn, sum(sx) AS psx, sum(sy) AS psy,
        |    sum(sxy) AS psxy, sum(sxx) AS psxx FROM m)
        |SELECT grp, n::BIGINT AS n_rows,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_group,
        |  round((pn * psxy - psx * psy) / (pn * psxx - psx * psx), 6)
        |    AS slope_pooled,
        |  ((n * sxy - sx * sy) / (n * sxx - sx * sx) *
        |   ((pn * psxy - psx * psy) / (pn * psxx - psx * psx)) < 0) AS sign_flip
        |FROM m, p ORDER BY grp""".stripMargin,
    "q311_abtest_power" ->
      """SELECT event_type, count(*)::BIGINT AS n_obs,
        |  round(avg(value), 4) AS mean_value,
        |  round(sqrt(var_samp(value)), 4) AS sd_value,
        |  ceil((1.96 + 0.84) * (1.96 + 0.84) * 2.0 * var_samp(value) /
        |    ((0.05 * avg(value)) * (0.05 * avg(value))))::BIGINT AS n_per_arm
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q313_cramers_v" ->
      """WITH base AS (SELECT event_type AS et, dayofweek(ts)::BIGINT AS wd
        |  FROM events),
        |obs AS (SELECT et, wd, count(*)::DOUBLE AS o FROM base GROUP BY 1, 2),
        |cells AS (SELECT g.et, g.wd, coalesce(o.o, 0.0) AS o
        |  FROM (SELECT et, wd FROM (SELECT DISTINCT et FROM obs),
        |        (SELECT DISTINCT wd FROM obs)) g
        |  LEFT JOIN obs o ON g.et = o.et AND g.wd = o.wd),
        |mx AS (SELECT et, sum(o) AS nx FROM cells GROUP BY 1),
        |my AS (SELECT wd, sum(o) AS ny FROM cells GROUP BY 1),
        |dims AS (SELECT count(DISTINCT et)::DOUBLE AS r,
        |    count(DISTINCT wd)::DOUBLE AS c, sum(o) AS n FROM cells),
        |x AS (SELECT r, c, n,
        |    sum((o - nx * ny / n) * (o - nx * ny / n) / (nx * ny / n)) AS chi2
        |  FROM cells JOIN mx USING (et) JOIN my USING (wd), dims
        |  GROUP BY r, c, n)
        |SELECT n::BIGINT AS n, r::BIGINT AS n_types, c::BIGINT AS n_weekdays,
        |  round(chi2, 4) AS chi2,
        |  round(sqrt(chi2 / n / least(r - 1, c - 1)), 6) AS cramers_v,
        |  round(sqrt(greatest(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1)) /
        |    least(r - (r - 1) * (r - 1) / (n - 1) - 1,
        |          c - (c - 1) * (c - 1) / (n - 1) - 1)), 6) AS v_bias_corrected
        |FROM x""".stripMargin,
    "q99_approx_quantiles" ->
      """WITH vals AS (
        |  SELECT l_returnflag AS k, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |g AS (SELECT DISTINCT k, n FROM vals),
        |t AS (SELECT k, pi, ((n - 1) * pn) // 100 + 1 AS rlo
        |      FROM g, (VALUES (0, 50), (1, 95)) AS ps(pi, pn)),
        |d AS (SELECT t.k, t.pi, vals.v
        |      FROM t JOIN vals ON vals.k = t.k AND vals.rn = t.rlo)
        |SELECT g.k AS l_returnflag, g.n::BIGINT AS n,
        |  max(CASE WHEN pi = 0 THEN v END) AS p50_disc,
        |  max(CASE WHEN pi = 1 THEN v END) AS p95_disc,
        |  true AS p50_apx_ok, true AS p95_apx_ok,
        |  true AS p50_interp_ok, true AS p95_interp_ok
        |FROM g JOIN d ON d.k = g.k
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
  )
}
