package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: temporal analytics — as-of/interval joins, sessions, funnels, windows, time-series diagnostics.
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesTime { this: Queries.type =>

  /** E10: window ranking — top 3 orders per priority. Single shuffle on
    * the partition key; rank pushdown (WindowGroupLimit) keeps only 3
    * rows per key per partition before the sort at scale.
    */
  def q04_window_rank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_orderpriority", "rn")
  }

  /** E11: analytic window — per-customer running order total (ROWS
    * frame ⇒ summation order is frame-defined, so rounding is safe) and
    * the previous order's price via lag.
    */
  def q13_window_running(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(lead("o_totalprice", 1).over(w), 2).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E22: tumbling-window aggregation on event time (the batch
    * equivalent of the streaming `window()` group — same expression
    * runs under readStream+watermark; see StreamingSpec).
    */
  def q28_window_tumble(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total"))
      .orderBy("wstart", "event_type")

  /** E24: session windows (6h inactivity gap) per user via
    * `session_window` — DuckDB oracle is the gaps-and-islands rewrite.
    */
  def q29_sessions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .select(col("user_id"), col("w.start").as("s_start"), col("n_events"), col("total"))
      .orderBy("user_id", "s_start")

  /** E22 (sliding half): 2-day windows sliding by 1 day — every event
    * lands in exactly two overlapping buckets.
    */
  def q32_window_slide(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total"))
      .orderBy("wstart", "event_type")

  /** Backward as-of join (operators/AsOfJoin): each purchase event gets
    * the user's most recent prior-or-simultaneous click. One shuffle on
    * user_id — union+window, never a per-pair range join. Unmatched
    * rows take sentinel defaults (epoch / -1 / 0.0) in BOTH engines so
    * the hash compare never meets engine-specific null stringification.
    */
  def q38_asof_join(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    AsOfJoin.backward(purchases, clicks,
      keyCol = "user_id", leftTsCol = "ts", rightTsCol = "ts",
      rightTieCol = "event_id", rightPrefix = "click_")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        coalesce(col("click_ts"), lit("1970-01-01 00:00:00").cast("timestamp")).as("click_ts"),
        coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy("event_id")
  }

  /** Interval join (operators/IntervalJoin): purchase–click pairs of
    * the same user within 30 minutes, via time-binned equi-join —
    * shuffle keys are (user, bin), never a BNLJ range condition.
    */
  def q44_interval_join(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IntervalJoin
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    IntervalJoin.within(purchases, clicks,
      keyCol = "user_id", leftTsCol = "ts", rightTsCol = "ts",
      deltaUs = 30L * 60 * 1000000, rightPrefix = "click_")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum("click_value"), 2).as("click_total"))
      .orderBy("user_id")
  }

  /** Time-series resampling to OHLC candles: per (user, day) the
    * first/last (by event time, id-tiebroken) and min/max values.
    * first/last via one ranking window each direction — deterministic
    * where `first_value`/`min_by` tie-breaking is not; min/max ride the
    * same aggregation. One shuffle on (user, day).
    */
  def q50_ohlc(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("value"))
    val asc = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn_f", row_number().over(asc))
      .withColumn("rn_l", row_number().over(desc))
      .groupBy("user_id", "day")
      .agg(
        round(max(when(col("rn_f") === 1, col("value"))), 2).as("open"),
        round(max(col("value")), 2).as("high"),
        round(min(col("value")), 2).as("low"),
        round(max(when(col("rn_l") === 1, col("value"))), 2).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "day")
  }

  /** Calendar gap-fill with forward fill: generate each user's full
    * daily span (`sequence`+`explode` — executor-side row generation,
    * no driver loop), left-join the actual daily totals, carry the
    * last seen value across gaps with `last(_, ignoreNulls)`. Shuffles:
    * the daily agg and the per-user fill window — both on user_id, so
    * AQE reuses one exchange.
    */
  def q51_gapfill(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("day_total"))
    val calendar = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val fillW = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("day_total"), ignoreNulls = true).over(fillW).as("filled_total"),
        col("day_total").isNull.cast("int").as("is_gap"))
      .orderBy("user_id", "day")
  }

  /** E10/E11 long tail: distribution-analytic window functions —
    * ntile quartiles, percent_rank, cume_dist, nth_value. pct_rank and
    * cume are emitted UNROUNDED: each is one IEEE division of
    * identical integers in both engines ((rank-1)/(n-1), k/n), so the
    * doubles are bitwise equal — safer than rounding, which could
    * straddle a half boundary (memory: the FP round-half trap).
    */
  def q54_window_analytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val runFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        coalesce(nth_value(col("o_orderkey"), 2).over(runFrame), lit(-1L)).as("second_key"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Forward as-of join (the other time direction of q38): each click
    * gets the user's NEXT purchase at-or-after it. Same union+window
    * single-shuffle machinery; ties resolve to the smallest event id.
    * Sentinel defaults keep nulls out of the hash compare (q38's
    * precedent).
    */
  def q59_asof_forward(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    AsOfJoin.forward(clicks, purchases,
      keyCol = "user_id", leftTsCol = "ts", rightTsCol = "ts",
      rightTieCol = "event_id", rightPrefix = "next_")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        coalesce(col("next_ts"), lit("1970-01-01 00:00:00").cast("timestamp")).as("next_ts"),
        coalesce(col("next_event_id"), lit(-1L)).as("next_event_id"),
        coalesce(col("next_value"), lit(0.0)).as("next_value"))
      .orderBy("event_id")
  }

  /** Rolling event-time window (RANGE frame): per user, the sum/count
    * of the trailing 7 days at every event — the moving-average shape
    * that tumbling windows (q28) cannot express. The frame is defined
    * on µs epoch VALUES, so rows tying on ts get identical frames in
    * both engines (peer-inclusive determinism, unlike a ROWS frame).
    */
  def q71_rolling_window(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-weekUs, 0)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("sum_7d", round(sum("value").over(w), 2))
      .select("event_id", "user_id", "n_7d", "sum_7d")
      .orderBy("event_id")
  }

  /** Conversion funnel: per signup cohort week, the share of users who
    * purchase within 7 days of first signup — the product-analytics
    * query every event warehouse serves. The purchase probe is an
    * EQUI-join on user_id with the time bounds as residual predicates
    * (hash join, never BNLJ); conversion collapses per user before the
    * tiny cohort rollup, so the wide side is touched exactly once.
    */
  def q77_funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    signup.join(purch,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("signup_ts") &&
          col("p_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"), "left")
      .groupBy("user_id", "signup_ts")
      .agg(max(col("p_ts").isNotNull.cast("int")).as("converted"))
      .groupBy(to_date(date_trunc("week", col("signup_ts"))).as("cohort_week"))
      .agg(
        count(lit(1)).as("n_users"),
        sum("converted").as("n_converted"),
        floor(lit(10000.0) * sum("converted") / count(lit(1))).cast("long").as("conv_bp"))
      .orderBy("cohort_week")
  }

  /** Cohort retention matrix: users grouped by first-activity week,
    * counted distinct in each subsequent week — two shuffles (per-user
    * cohort, then the distinct-count on (cohort, week)). The week
    * offset is integer day arithmetic on DATE-truncated weeks, so both
    * engines bucket identically (Monday weeks, 2024-01-01 epoch).
    */
  def q78_retention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cohort = ev.groupBy("user_id")
      .agg(to_date(date_trunc("week", min("ts"))).as("cohort_week"))
    val act = ev.select(col("user_id").as("a_user"),
      to_date(date_trunc("week", col("ts"))).as("act_week")).distinct()
    cohort.join(act, col("user_id") === col("a_user"))
      .select(col("cohort_week"),
        floor(datediff(col("act_week"), col("cohort_week")) / 7).cast("int").as("week_n"),
        col("user_id"))
      .groupBy("cohort_week", "week_n")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_n")
  }

  /** Event-time inter-arrival gaps per user — stream-health telemetry.
    * max gap needs the lag window; mean gap telescopes to
    * (last−first)/(n−1), all integer µs arithmetic (DIV) — zero FP in
    * the output. One shuffle on user_id serves window and aggregation.
    */
  def q87_event_gaps(s: SparkSession, dir: String): DataFrame = {
    // Window ordering uses the post-projection alias `us` — the
    // pre-projection `ts` no longer resolves after the select.
    val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("gap").as("max_gap_us"),
        ((max("us") - min("us")) / (count(lit(1)) - 1)).cast("long").as("avg_gap_us"))
      .filter(col("n_events") >= 2)
      .orderBy("user_id")
  }

  /** Trailing-7-day distinct users per day — windowed COUNT DISTINCT,
    * which neither windows (no distinct frames) nor plain aggs
    * express. Scale shape: daily distinct sets are built once (one
    * agg), then each day's set is CONTRIBUTED to the ≤7 window days it
    * belongs to via an explode of offsets — every shuffle stays
    * equi-keyed on a date, no range join, no global window, state
    * bounded by |users/day|·7. The oracle uses DuckDB's range join +
    * COUNT(DISTINCT) formulation of the same thing.
    */
  def q100_rolling_distinct(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val daily = pairs.groupBy("day")
      .agg(collect_set(col("user_id")).as("users"))
    val contrib = daily
      .select(col("day"), col("users"), explode(sequence(lit(0), lit(6))).as("i"))
      .select(date_add(col("day"), col("i")).as("wday"), col("users"))
    val win7 = contrib.groupBy("wday")
      .agg(size(array_distinct(flatten(collect_list(col("users"))))).cast("long").as("n_users_7d"))
    daily
      .select(col("day"), size(col("users")).cast("long").as("n_users_day"))
      .join(win7, col("day") === col("wday"))
      .select("day", "n_users_day", "n_users_7d")
      .orderBy("day")
  }

  /** Peak concurrency (max overlapping 5-minute sessions) per event
    * type. The oracle runs the textbook single-window ±1 sweep; the
    * engine side runs Concurrency.peakConcurrent's two-level
    * distributed scan (within-day running sum + per-day carry-in
    * prefix sum), which is algebraically identical — see that operator
    * for the decomposition proof and the tie-determinism argument.
    */
  def q111_max_concurrency(s: SparkSession, dir: String): DataFrame =
    graft.operators.Concurrency.peakConcurrent(
      t(s, dir, "events"), "event_type", "ts", 300L)
      .orderBy("event_type")

  /** Linear interpolation of gaps in a per-user daily series — the
    * numeric upgrade of q51's carry-forward fill: missing days get
    * pv + (nv−pv)·(day−pd)/(nd−pd) between the bracketing observed
    * days. Four IGNORE NULLS window passes over ONE user-keyed
    * shuffle (same partition spec, the sort is reused). Arithmetic is
    * INTEGER-CENT fixed point: the float form lands on exact
    * half-cent boundaries (e.g. midpoint of two 2-decimal values)
    * where Spark's BigDecimal HALF_UP and DuckDB's float-path
    * rounding legally disagree, while floor((nv−pv)·dd / dn) over
    * longs < 2⁵³ is IEEE-EXACT in both engines (the quotient is
    * correctly rounded, so its floor can only be wrong if the true
    * quotient were within one ulp of an integer — impossible for
    * exact-integer operands unless it IS that integer).
    */
  def q117_interp_linear(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events").filter(col("user_id") < 100)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(round(sum("value") * 100, 0).cast("long").as("cents"))
    val cal = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val j = cal.join(daily, Seq("user_id", "day"), "left")
    val w = Window.partitionBy("user_id").orderBy("day")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    j.withColumn("pv", last("cents", ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first("cents", ignoreNulls = true).over(wNext))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("day"),
        when(col("cents").isNotNull, col("cents"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + floor((col("nv") - col("pv")) *
            datediff(col("day"), col("pd")) / datediff(col("nd"), col("pd"))))
          .as("est_cents"),
        when(col("cents").isNull, 1).otherwise(0).as("interpolated"))
      .orderBy("user_id", "day")
  }

  /** Entry-path analysis: the first 3 event types per user (ordered by
    * ts, event_id) as a ">"-joined path string, counted across users —
    * the onboarding-flow query. Per-user state is ONE sorted struct
    * array bounded by the user's history (collect_list + sort_array —
    * at 100 TB, cap with a WindowGroupLimit rank≤3 pre-filter per
    * user); the path count is a partial+final agg; top-15 plans
    * TakeOrderedAndProject.
    */
  def q118_path_analysis(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        transform(slice(col("evs"), 1, 3), e => e.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), col("path"))
      .limit(15)

  /** Period-over-period (month-over-month) revenue deltas per order
    * priority — the lag() growth report every revenue dashboard runs.
    * Delta is INTEGER basis points over integer cents (floor of an
    * exact-long division — engine-exact, q117's argument), computed
    * after the monthly pre-aggregation so the window sees only
    * |priorities|·|months| rows, partitioned by priority (never a
    * global window).
    */
  def q122_period_over_period(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        trunc(col("o_orderdate"), "month").as("month"))
      .agg(round(sum("o_totalprice") * 100, 0).cast("long").as("cents"))
    val w = Window.partitionBy("prio").orderBy("month")
    monthly.withColumn("prev_cents", lag("cents", 1).over(w))
      .select(col("prio").as("o_orderpriority"), col("month"), col("cents"),
        coalesce(floor((col("cents") - col("prev_cents")) * 10000
          / col("prev_cents")), lit(0L)).as("delta_bp"))
      .orderBy("o_orderpriority", "month")
  }

  /** Funnel conversion lag: per user, first 'view' → first subsequent
    * 'purchase', lag in whole seconds (exact integer µs arithmetic),
    * then per-cohort discrete (type-1) quantiles via q40's
    * rank-equality pattern — never an interpolated percentile, whose
    * (n−1)·q float product can land on either side of an integer on
    * different engines. Two keyed min-aggs + one cohort-partitioned
    * rank window over |converting users| rows.
    */
  def q135_funnel_lag(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val lag = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy("user_id", "v_us").agg(min("us").as("p_us"))
      .select(col("user_id"),
        expr("(p_us - v_us) div 1000000").as("lag_sec"))
      .withColumn("cohort", col("user_id") % 4)
    val ranked = lag
      .withColumn("rn", row_number().over(
        Window.partitionBy("cohort").orderBy(col("lag_sec"), col("user_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("cohort")))
    ranked.groupBy("cohort")
      .agg(count(lit(1)).as("n_converted"),
        max(when(col("rn") === greatest(lit(1L), ceil(lit(0.5) * col("n"))),
          col("lag_sec"))).as("p50_sec"),
        max(when(col("rn") === greatest(lit(1L), ceil(lit(0.9) * col("n"))),
          col("lag_sec"))).as("p90_sec"),
        max(col("lag_sec")).as("max_sec"))
      .orderBy("cohort")
  }

  /** Watermark-lateness audit — the telemetry that CHOOSES a streaming
    * watermark delay: treating event_id as arrival order, how far
    * behind the running max event-time does each event arrive?
    * Running max over a day-partitioned window (at 100 TB the
    * partition key is (day, ingest shard) — arrival order only exists
    * per shard anyway), then per-day discrete p50/p95/max lateness in
    * exact integer seconds.
    */
  def q137_lateness_audit(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events").select(
      to_date(col("ts")).as("day"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("day").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = base
      .withColumn("runmax", max("us").over(w))
      .select(col("day"), col("event_id"),
        expr("(runmax - us) div 1000000").as("late_sec"))
    val ranked = late
      .withColumn("rn", row_number().over(
        Window.partitionBy("day").orderBy(col("late_sec"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("day")))
    ranked.groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === greatest(lit(1L), ceil(lit(0.5) * col("n"))),
          col("late_sec"))).as("p50_late_sec"),
        max(when(col("rn") === greatest(lit(1L), ceil(lit(0.95) * col("n"))),
          col("late_sec"))).as("p95_late_sec"),
        max(col("late_sec")).as("max_late_sec"))
      .orderBy("day")
  }

  /** Gap/island detection over the event_id sequence (missing-data
    * audit after a lossy transfer): drop every 7th id, then find
    * maximal runs of consecutive ids with the classic id−rank trick —
    * the rank coming from PrefixSum.globalRank, so no single-partition
    * row_number over the full fact. Output is the island-length
    * histogram; all-integer arithmetic end to end.
    */
  def q139_gap_islands(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val ids = t(s, dir, "events")
      .filter(col("event_id") % 7 =!= 0)
      .select(col("event_id"))
    val ranked = PrefixSum.globalRank(ids, Seq("event_id"), "r")
    ranked
      .groupBy((col("event_id") - col("r")).as("island_key"))
      .agg(count(lit(1)).as("island_len"))
      .groupBy("island_len").agg(count(lit(1)).as("n_islands"))
      .orderBy("island_len")
  }

  /** Interval-union coverage (how much wall-clock was each user
    * active, counting ±15 min around each event ONCE even when they
    * overlap): the sorted-sweep island merge — a new island opens when
    * an interval starts past the running max end — with all
    * timestamps in exact integer µs. Window is per user (the natural
    * shard key); output aggregates to one row per user bucket.
    */
  def q143_interval_coverage(s: SparkSession, dir: String): DataFrame = {
    val half = 15L * 60L * 1000000L
    val iv = t(s, dir, "events").select(
      col("user_id"),
      (unix_micros(col("ts")) - half).as("s"),
      (unix_micros(col("ts")) + half).as("e"))
    val w = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
    val runEnd = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val islands = iv
      .withColumn("prev_max_e", max("e").over(runEnd))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum("new_island").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("s").as("is"), max("e").as("ie"))
    islands
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ie") - col("is")).as("covered_us"))
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(count(lit(1)).as("n_users"), sum("n_islands").as("n_islands"),
        expr("sum(covered_us) div 1000000").as("covered_sec"))
      .orderBy("user_bucket")
  }

  /** Per-group trend + next-period forecast: OLS slope/intercept of
    * daily event counts against the day index, per event type, plus
    * the day-31 projection — q102's one-pass co-moment machinery put
    * to work. The regression runs over 30 pre-aggregated points per
    * group; rounding (2dp) happens only at the output boundary.
    */
  def q144_trend_forecast(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(regr_slope(col("n"), col("day")), 2).as("slope"),
        round(regr_intercept(col("n"), col("day")), 2).as("intercept"),
        round(regr_intercept(col("n"), col("day"))
          + regr_slope(col("n"), col("day")) * 30.0, 2).as("forecast_day30"))
      .orderBy("event_type")
  }

  /** q38's backward as-of join through the NATIVE physical operator
    * (plans/AsOfJoinPlan.scala: custom LogicalPlan → Strategy →
    * SparkPlan with clustered+sorted child contracts — §7.4's deepest
    * extension rung): one forward merge per partition, O(1) state, no
    * tagged union, no window buffer. Same oracle semantics as q38
    * (timestamps travel as exact integer µs; unmatched rows take the
    * same sentinels); NativePlanSpec pins it to the composed form and
    * to constructions.
    */
  def q147_asof_native(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
    graft.plans.NativeAsOfJoin.backward(purchases, clicks,
      keyCol = "user_id", leftTsCol = "us", rightTsCol = "us",
      rightTieCol = "event_id", rightPrefix = "click_")
      .select(
        col("event_id"), col("user_id"), col("us").as("ts_us"),
        coalesce(col("click_us"), lit(0L)).as("click_ts_us"),
        coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
        round(coalesce(col("click_value"), lit(0.0)), 2).as("click_value"))
      .orderBy("event_id")
  }

  /** q147's forward mirror through the native exec: for each click,
    * the next purchase at-or-after it (earliest ts, smallest event_id
    * on ties) — q59's semantics, but planned as the custom
    * AsOfJoinExec merge instead of the composed union+window. Same
    * LATERAL oracle shape and sentinels as q59/q147; µs-long event
    * times for the exec's 64-bit contract.
    */
  def q150_asof_native_fwd(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
    graft.plans.NativeAsOfJoin.forward(clicks, purchases,
      keyCol = "user_id", leftTsCol = "us", rightTsCol = "us",
      rightTieCol = "event_id", rightPrefix = "next_")
      .select(
        col("event_id"), col("user_id"), col("us").as("ts_us"),
        coalesce(col("next_us"), lit(0L)).as("next_ts_us"),
        coalesce(col("next_event_id"), lit(-1L)).as("next_event_id"),
        round(coalesce(col("next_value"), lit(0.0)), 2).as("next_value"))
      .orderBy("event_id")
  }

  /** The native as-of join on a STRING key: for each open order, the
    * latest finished order of the same priority at-or-before its date
    * (ties → greatest orderkey). Exercises the generic-orderable key
    * binding of AsOfJoinExec (keys compare through the type's
    * interpreted ordering — UTF8String here — instead of the 64-bit
    * fast path q147/q150 use); day-granularity dates travel as exact
    * integer day numbers for the 64-bit ts contract. Same LATERAL
    * oracle shape as q147.
    */
  def q151_asof_string_key(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val dayN = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderpriority"), dayN.as("day_n"))
    val finished = o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), dayN.as("day_n"),
        col("o_orderkey"), col("o_totalprice"))
    graft.plans.NativeAsOfJoin.backward(open, finished,
      keyCol = "o_orderpriority", leftTsCol = "day_n", rightTsCol = "day_n",
      rightTieCol = "o_orderkey", rightPrefix = "f_")
      .select(col("o_orderkey"), col("o_orderpriority"), col("day_n"),
        coalesce(col("f_day_n"), lit(0L)).as("f_day"),
        coalesce(col("f_o_orderkey"), lit(-1L)).as("f_orderkey"),
        round(coalesce(col("f_o_totalprice"), lit(0.0)), 2).as("f_total"))
      .orderBy("o_orderkey")
  }

  /** Interval attribution join (the batch twin of the STREAM-STREAM
    * interval join — StreamingWindowSpec runs this exact join shape
    * under readStream with watermarks on both sides and proves the
    * results match this batch form): every purchase within 1 hour
    * after a click by the same user, rolled up per click-day. The
    * equi-key (user_id) makes it a sort-merge join with a range
    * residual — state in the streaming form is bounded by the
    * watermark delay, never the stream length.
    */
  def q154_interval_attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("ts").as("buy_ts"), col("value"))
    clicks.join(buys,
        col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(to_date(col("click_ts")).as("day"))
      .agg(count(lit(1)).as("n_attrib"), round(sum("value"), 2).as("attrib_value"))
      .orderBy("day")
  }

  /** Time-series seasonal profile: hour-of-day seasonality index per
    * event type (hourly mean value / the type's overall mean), plus
    * the hour's traffic share. One narrow scan → 120-group agg; the
    * window reads the agg output (5x24 rows), not the events.
    */
  def q156_seasonality(s: SparkSession, dir: String): DataFrame = {
    // Sums ride EXACT integer cents (q331's trick): summing raw
    // doubles is partial-sum-order dependent, and at sf0.001 the
    // last-ulp difference vs DuckDB's serial sum crossed a 4-dp
    // rounding boundary. Integer sums are order-free; every division
    // below starts from exact integers, so both engines compute
    // identical doubles.
    // avg_value and traffic_share round at 4 dp IN INTEGER ARITHMETIC
    // (half-up: (2a+b) div 2b): cent-sums over small n land exactly on
    // half-boundaries (e.g. 68.92875), where Spark's round (shortest
    // decimal repr, HALF_UP) and DuckDB's (raw-double scaling) split.
    // season_idx keeps the double round: its denominator n·type_sc
    // makes an exact 4-dp half-boundary unconstructible in this data,
    // and the exact-integer form would overflow int64 at corpus scale.
    // NON-NEGATIVE ASSUMPTION: the half-up form (2a+b) div (2b) — and
    // the DuckDB `//` mirror — is only half-up for a >= 0 (Spark `div`
    // truncates, DuckDB `//` floors; they also diverge from each other
    // on negatives). events.value is a price, min 0.03 by generation;
    // a refund-style negative feed would need a sign-aware floorDiv
    // rewrite ON BOTH SIDES. Guarded here so the assumption fails loud
    // instead of silently mis-rounding.
    val w = Window.partitionBy("event_type")
    t(s, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("sc"))
      .withColumn("type_n", sum("n").over(w))
      .withColumn("type_sc", sum("sc").over(w))
      .select(col("event_type"), col("hod"), col("n"),
        when(col("sc") >= 0, expr("(2 * sc * 100 + n) div (2 * n)") / 10000.0)
          .otherwise(raise_error(lit(
            "q156: negative cent sum — the half-up (2a+b) div (2b) " +
              "form needs a sign-aware floorDiv rewrite on both engines"))
            .cast("double"))
          .as("avg_value"),
        round((col("sc").cast("double") / col("n")) /
          (col("type_sc").cast("double") / col("type_n")), 4)
          .as("season_idx"),
        (expr("(2 * n * 240000 + type_n) div (2 * type_n)") / 10000.0)
          .as("traffic_share"))
      .orderBy("event_type", "hod")
  }

  /** SEQUENTIAL conversion funnel: first view → first click within 12h
    * of it → first purchase within 12h of that click, per user; output
    * = users surviving each stage. Differs from q77 (signup→any-
    * purchase conversion, one hop) in that each stage's clock starts
    * at the PREVIOUS stage's achieved timestamp — the chained
    * dependency is what makes multi-step funnels irreducible to one
    * join. Each stage is a filtered scan + per-user
    * min-aggregate JOINED to the previous stage's (user, ts) frame —
    * the event_type filters push to parquet, every join key is
    * user_id, and each stage frame is one row per surviving user, so
    * the at-scale cost is three pushdown-filtered scans plus shuffles
    * of per-user aggregates (map-side combined). Stage frames are
    * persisted because stage N is consumed by both stage N+1 and the
    * final counts.
    */
  def q196_funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val w = expr("INTERVAL 12 HOURS")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t0"))
      .persistTracked()
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t0") && col("ts") <= col("t0") + w)
      .groupBy("user_id").agg(min("ts").as("t1"))
      .persistTracked()
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + w)
      .groupBy("user_id").agg(min("ts").as("t2"))
    v.agg(count(lit(1)).as("users"))
      .select(lit(1).as("stage"), lit("view").as("step"), col("users"))
      .unionAll(c.agg(count(lit(1)).as("users"))
        .select(lit(2).as("stage"), lit("click_within_12h").as("step"), col("users")))
      .unionAll(p.agg(count(lit(1)).as("users"))
        .select(lit(3).as("stage"), lit("purchase_within_12h").as("step"), col("users")))
      .orderBy("stage")
  }

  /** Cohort retention, NORMALIZED day-grain form (q78 is the raw
    * week-grain count matrix): users cohorted by first-seen DATE,
    * retention = FRACTION of the cohort with a purchase on day offset
    * 0..7. The cohort frame (one row per user) is persisted — consumed
    * by the size aggregate and the activity join; cohort sizes are a
    * date-cardinality frame, always broadcast. Counting (cohort,
    * offset) groups over the DISTINCT (user, day) activity frame makes
    * count(*) = distinct users without a count-distinct Expand.
    * Division happens once per output row on already-aggregated
    * counts — exact across engines.
    */
  def q197_cohort_retention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val f = ev.groupBy("user_id").agg(to_date(min("ts")).as("cohort"))
      .persistTracked()
    val sz = f.groupBy("cohort").agg(count(lit(1)).as("n0"))
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    f.join(a, "user_id")
      .select(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("offset_d"))
      .filter(col("offset_d").between(0, 7))
      .groupBy("cohort", "offset_d").agg(count(lit(1)).as("users"))
      .join(broadcast(sz), "cohort")
      .select(col("cohort"), col("offset_d"), col("users"),
        round(col("users").cast("double") / col("n0"), 4).as("retention"))
      .orderBy("cohort", "offset_d")
  }

  /** Last-touch attribution: every purchase credits the most recent
    * click STRICTLY BEFORE it (by (ts, event_id) order) within 7 days
    * by the same user; credit rolls up to the click's campaign key
    * (the props JSON `k`). ONE window pass does the matching —
    * `last(click-struct, ignoreNulls)` over rows unbounded..1
    * PRECEDING on the unioned click/purchase stream — the q38
    * union-window as-of trick: no range join, no per-purchase scan;
    * state per partition is one struct. At 100 TB this shuffles each
    * user's clicks+purchases once on user_id; the window never spans
    * users. The frame ending at 1 PRECEDING is what encodes
    * "strictly before" without a tie predicate.
    */
  def q205_attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("lastc",
        last(when(col("event_type") === "click", struct(col("ts").as("cts"), col("k").as("ck"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("lastc").isNotNull &&
        col("lastc.cts") >= col("ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("lastc.ck").as("campaign"))
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("credited_value"))
      .orderBy("campaign")
  }

  /** Half-life-decayed engagement score (the feature-store "decayed
    * counter"): each purchase contributes value · 0.5^(whole weeks
    * before the corpus frontier) — recency-weighted spend without a
    * mutable state store, recomputable from the log at any time. The
    * frontier rides in as a broadcast 1-row aggregate. The decay is
    * FLOORED at 20 half-lives (a 2^-20 ≈ 1e-6 weight — decayed to
    * noise), which is what lets the whole sum run in EXACT INTEGER
    * arithmetic: each term is cents · 2^(20−min(wk,20)), an int64
    * (≤2^41 per term), so the per-user reduction is order-independent
    * and engine-identical — the sf0.1 sweep caught the previous
    * dyadic-double sum differing from DuckDB's by one ULP exactly on
    * a 2-dp rounding boundary (805.955). The single division by
    * 100·2^20 happens once per user on the exact integer. One shuffle
    * on user_id, top-20 plans TakeOrderedAndProject.
    */
  def q215_decayed_engagement(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events").filter(col("event_type") === "purchase")
    val frontier = p.agg(max(to_date(col("ts"))).as("now"))
    p.crossJoin(broadcast(frontier))
      .withColumn("wk", least(
        floor(datediff(col("now"), to_date(col("ts"))) / 7), lit(20L)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(expr("cast(round(value * 100, 0) as bigint)") *
          call_function("shiftleft", lit(1L), (lit(20) - col("wk")).cast("int")))
          / (100.0 * (1L << 20)), 2).as("decayed_spend"))
      .orderBy(col("decayed_spend").desc, col("user_id").asc)
      .limit(20)
  }

  /** CUSUM drift detection (Page 1954) over the daily purchase series:
    * S_t = running sum of (countₜ − mean), drift D_t = S_t − min_{s≤t} S_s,
    * alarm at max drift — the sequential change-point monitor a
    * pipeline runs on ingest volumes (q206's KS asks "are two samples
    * different"; CUSUM asks WHEN the level shifted). Both cumulative
    * windows are SEQUENTIAL frames over the day-grain series (bounded
    * by calendar days, not corpus rows), so their double arithmetic is
    * bit-identical across engines (q183's precedent); the mean is a
    * broadcast 1-row aggregate.
    */
  def q227_cusum_drift(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val mean = daily.agg((sum("n") / count(lit(1))).as("mu"))
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(mean))
      .withColumn("s", sum(col("n") - col("mu")).over(wCum))
      .withColumn("drift", col("s") - min("s").over(wCum))
      .orderBy(col("drift").desc, col("day").asc)
      .limit(1)
      .select(col("day").as("alarm_day"), col("n").as("day_count"),
        round(col("drift"), 4).as("max_drift"))
  }

  /** Autocorrelation function of the daily purchase-count series at
    * lags 1..7 — the "is there weekly structure" diagnostic feeding
    * q156's seasonal profile (ACF measures it; the profile assumes
    * it). ACF_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)², lag alignment by
    * window `lag` over the DAY-grain frame; the mean and the
    * denominator ride in as one broadcast 1-row aggregate. Exact
    * integer counts; the float products follow the same
    * sequential-frame determinism as q227.
    */
  def q234_acf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.agg((sum("n") / count(lit(1))).as("mu"))
    val centered = daily.crossJoin(broadcast(stats))
      .withColumn("d", col("n") - col("mu"))
    val wDay = Window.orderBy("day")
    val lagged = (1 to 7).foldLeft(centered)((df, k) =>
      df.withColumn(s"d_$k", lag(col("d"), k).over(wDay)))
    val denom = lagged.agg(sum(col("d") * col("d")).as("ss"))
    val accs = (1 to 7).map(k =>
      round(sum(col("d") * col(s"d_$k")) / first(col("ss")), 4).as(s"acf_$k"))
    lagged.crossJoin(broadcast(denom))
      .agg(count(col("d")).as("n_days"), accs: _*)
  }

  /** Linear (equal-split) multi-touch attribution: every click within
    * the 7 days before a purchase shares the purchase's value equally
    * — the fractional complement to q205's last-touch winner-take-all
    * (same window, opposite credit philosophy; a marketing stack runs
    * both and diffs them). One user-co-partitioned equi-join bounds
    * candidates, a per-purchase window count sets each click's share.
    *
    * EXACT-INTEGER CONTRACT (dev/SWEEP.md patterns; the round-10
    * sf0.001 sweep caught campaign 60 on a half-cent boundary where
    * the float Σ(value/n) flipped 123.94/123.95 with the engines'
    * association order): shares are integer MICRO-CENTS floored per
    * touch — (cents·10⁶) div n, exact in both engines — summed as
    * BIGINT (order-independent), and the campaign total re-rounds to
    * cents with the half-up integer form (2a+b) div (2b). Per-touch
    * floor error ≤ 10⁻⁸ dollars; values are non-negative by schema
    * (q156's guard note applies to the half-up form).
    */
  def q235_linear_attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("campaign"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"), col("value"))
    val touches = p.join(c, Seq("user_id"))
      .filter(col("cts") <= col("pts") &&
        col("cts") > col("pts") - expr("INTERVAL 7 DAYS"))
    val nTouch = Window.partitionBy("pid")
    touches
      // q156's fail-loud guard: DIV truncates (Spark) vs // floors
      // (DuckDB) and the half-up form is only half-up for cents >= 0;
      // a refund-style negative value must break loudly, not
      // silently mis-round. NULL gets its own branch + message: with
      // only `value >= 0`, a NULL value falls into otherwise() (NULL
      // >= 0 is NULL) and would raise the misleading "negative"
      // error — while DuckDB's oracle SUM silently drops the NULL,
      // so the engines would fail asymmetrically on dirty data.
      .withColumn("cents",
        when(col("value").isNull, raise_error(lit(
          "q235: NULL purchase value — oracle SUM drops NULLs while " +
            "the share DIV propagates them; clean or impute upstream"))
          .cast("long"))
          .when(col("value") >= 0, round(col("value") * 100).cast("long"))
          .otherwise(raise_error(lit(
            "q235: negative purchase value — the micro-cent DIV form " +
              "needs a sign-aware floorDiv rewrite on both engines"))
            .cast("long")))
      .withColumn("nt", count(lit(1)).over(nTouch))
      .withColumn("share_u", expr("cents * 1000000 DIV nt"))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_touches"), sum("share_u").as("su"))
      .select(col("campaign"), col("n_touches"),
        (expr("(su * 2 + 1000000) DIV 2000000") / 100.0).as("credited_value"))
      .orderBy("campaign")
  }

  /** Prediction-interval coverage backtest: per event type, an [p10,
    * p90] interval fitted on the FIRST half-month by exact rank
    * arithmetic (q93's ntile integers — no interpolation, both engines
    * pick the same order statistic), then the EMPIRICAL coverage of
    * that frozen interval on the second half — the calibration
    * question behind any quantile forecast ("did 80% intervals cover
    * 80%?"). Coverage counts are exact integers; train quantiles are
    * exact value picks via per-type rank windows (type-partitioned,
    * never global).
    */
  def q250_interval_coverage(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("ts"), col("value"))
    val train = ev.filter(col("ts") < cut)
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("value").asc, col("ts").asc)))
    val sizes = train.groupBy("event_type").agg(count(lit(1)).as("n"))
    // order statistic at ceil(q·n) — integer arithmetic both engines share
    val bounds = train.join(broadcast(sizes), "event_type")
      // ceil(q·n) spelled in integers: (n·10q + 9) ⌊/⌋ 10 — the double
      // quotient is exact at any realistic n, truncation = floor
      .withColumn("lo_pick", ((col("n") + 9) / 10).cast("long"))
      .withColumn("hi_pick", ((col("n") * 9 + 9) / 10).cast("long"))
      .groupBy("event_type")
      .agg(max(when(col("rk").cast("long") === col("lo_pick"), col("value"))).as("p10"),
        max(when(col("rk").cast("long") === col("hi_pick"), col("value"))).as("p90"))
    ev.filter(col("ts") >= cut)
      .join(broadcast(bounds), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_test"),
        round(first(col("p10")), 2).as("p10"),
        round(first(col("p90")), 2).as("p90"),
        sum(when(col("value") >= col("p10") && col("value") <= col("p90"), 1L)
          .otherwise(0L)).as("n_covered"))
      .withColumn("coverage", round(col("n_covered") / col("n_test"), 4))
      .orderBy("event_type")
  }

  /** Rolling 7-day OLS slope of the daily purchase series — the local
    * trend detector between q227's global change-point and q254's
    * global robust slope. Every rolling moment (Σx, Σy, Σxy, Σx², n)
    * is an INTEGER window sum, so frame-internal summation order can
    * never matter (the usual sliding-window float hazard is designed
    * out); the slope is one integer-ratio division per day. Day-grain
    * frame, trailing ROWS frame of 7.
    */
  def q256_rolling_slope(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sx", sum("d").over(w))
      .withColumn("sy", sum("n").over(w))
      .withColumn("sxy", sum(col("d") * col("n")).over(w))
      .withColumn("sxx", sum(col("d") * col("d")).over(w))
      .filter(col("cnt") === 7)
      .withColumn("slope", round(
        (col("cnt") * col("sxy") - col("sx") * col("sy")) /
          (col("cnt") * col("sxx") - col("sx") * col("sx")), 4))
      .orderBy(col("day").desc)
      .limit(10)
      .select(col("day"), col("n"), col("slope"))
      .orderBy("day")
  }

  /** Classical seasonal decomposition of daily revenue: trend =
    * centered 7-day moving average, seasonal = per-weekday mean of the
    * detrended series, residual = what's left — the additive
    * decompose that explains q156's seasonality profile and feeds
    * anomaly thresholds (a spike is only a spike relative to
    * trend+season). The whole computation runs on the DAY-GRAIN
    * revenue frame (calendar-bounded, never corpus rows), so the
    * sequential moving-average window is a global window by design —
    * the q234/q227 pattern. Daily revenue is rounded ONCE before any
    * window so every downstream difference starts from
    * engine-identical inputs; edge days without a full 7-day window
    * are dropped (n7 = 7), the textbook centered-MA rule.
    */
  def q266_seasonal_decompose(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val win = Window.orderBy("day").rowsBetween(-3, 3)
    val d = daily
      .withColumn("n7", count(lit(1)).over(win))
      .withColumn("trend", sum("rev").over(win) / 7.0)
      .filter(col("n7") === 7)
      .withColumn("detr", col("rev") - col("trend"))
      .withColumn("wd", dayofweek(col("day")))
    // wd is only a join key WITHIN this engine (never output), so the
    // engines' differing dayofweek conventions group identically
    val seas = d.groupBy("wd")
      .agg((sum("detr") / count(lit(1))).as("seasonal"))
    d.join(seas, "wd")
      .select(col("day"), col("rev"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("detr") - col("seasonal"), 4).as("resid"))
      .orderBy("day")
  }

  /** Session-timeout advisor: the inter-event gap mass by power-of-two
    * bucket, with the cumulative share that picks the knee — "a 2^b
    * second timeout keeps X% of consecutive-event pairs in one
    * session", the number that justifies q29/q39's session gap instead
    * of folklore. Gap seconds are q282's exact integers; the bucket is
    * length(bin(gap)) (exact — q286's rule); the cumulative runs over
    * the ≤ 64-row bucket frame. The `keeps_95` flag marks the first
    * bucket whose cumulative share reaches 0.95.
    */
  def q288_session_timeout(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        floor(unix_micros(col("ts").cast("timestamp")) / lit(1e6))
          .cast("long").as("t"))
    val gaps = ev
      .withColumn("gap",
        col("t") - lag("t", 1).over(
          Window.partitionBy("user_id").orderBy("t", "event_id")))
      .filter(col("gap").isNotNull)
      .select(length(bin(col("gap"))).cast("long").as("gap_bits"))
    val buckets = gaps.groupBy("gap_bits").agg(count(lit(1)).as("n_gaps"))
    val tot = buckets.agg(sum("n_gaps").as("total"))
    val w = Window.orderBy("gap_bits")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets.crossJoin(broadcast(tot))
      .withColumn("cum", sum("n_gaps").over(w))
      .select(col("gap_bits"), col("n_gaps"),
        round(col("cum") / col("total"), 6).as("cum_share"),
        (col("cum") * 100 >= col("total") * 95 &&
          (col("cum") - col("n_gaps")) * 100 < col("total") * 95).as("keeps_95"))
      .orderBy("gap_bits")
  }

  /** Binary-segmentation changepoint: the single day boundary that
    * removes the most squared error when the daily-revenue series is
    * split into two constant-mean segments — the exact LOCATION
    * readout behind q227's CUSUM alarm (CUSUM says "drifted", this
    * says "on this day, by this much"). Every candidate boundary is
    * scored from ONE pass of prefix moments (cumulative Σrev, Σrev²
    * over the calendar-bounded day frame — the q234/q227 global-window
    * pattern) against 1-row broadcast totals; gain = SSE_total −
    * SSE_left − SSE_right in fixed-order float arithmetic, argmax by
    * (gain, day) so the winner is engine-identical.
    */
  def q297_changepoint_sse(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(count(lit(1)).cast("double").as("n"),
      sum("rev").as("s1"), sum(col("rev") * col("rev")).as("s2"))
    val pre = daily
      .withColumn("k", count(lit(1)).over(w).cast("double"))
      .withColumn("c1", sum("rev").over(w))
      .withColumn("c2", sum(col("rev") * col("rev")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("k") < col("n")) // a split needs a non-empty right side
    val sseT = col("s2") - col("s1") * col("s1") / col("n")
    val sseL = col("c2") - col("c1") * col("c1") / col("k")
    val sseR = (col("s2") - col("c2")) -
      (col("s1") - col("c1")) * (col("s1") - col("c1")) / (col("n") - col("k"))
    pre.withColumn("gain", sseT - sseL - sseR)
      .orderBy(col("gain").desc, col("day").asc)
      .limit(1)
      .select(col("day").as("boundary_after"), col("k").cast("long").as("n_left"),
        round(col("c1") / col("k"), 4).as("mean_left"),
        round((col("s1") - col("c1")) / (col("n") - col("k")), 4).as("mean_right"),
        round(col("gain"), 4).as("sse_gain"))
  }

  /** EWMA control chart over daily purchase revenue — the
    * small-persistent-shift monitor next to q227's CUSUM (CUSUM is the
    * sequential-decision form; the EWMA chart is what ops dashboards
    * actually plot). The smoother is the NORMALIZED trailing form
    * ewma_t = Σ λ̄^(t−k)·x_k / Σ λ̄^(t−k) over a 60-day RANGE frame with
    * λ̄ = 1/2. The exponents are WINDOW-RELATIVE — each frame row is
    * weighted pow(0.5, t−k) with t−k ∈ [0, 59], via a collect_list of
    * the (day_idx, rev) frame and a bounded higher-order aggregate
    * that can see the current row's t (absolute pow(2, day_idx)
    * weights overflow double to Infinity at day_idx ≥ 1024 — and the
    * Σ4^k variance sum at ≥ 512 — silently NaN-ing every series that
    * spans ~1.4+ years). Every weight is an EXACT power of two in
    * both engines and the trailing truncation drops < 2^-59 of the
    * estimate, far under the 4-dp rounding. Control
    * limits use the exact finite-window variance factor Σw²/(Σw)², so
    * early days get the correct WIDER limits; the in-control (μ₀, σ₀)
    * come from the first-30-day BURN-IN only — estimating them over
    * the whole series would let a later shift inflate its own control
    * limits and mask itself. The window is a day-grain single
    * partition — bounded by the calendar, never by row count.
    */
  def q303_ewma_chart(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val d0 = daily.agg(min("day").as("day0"))
    val withIdx = daily.crossJoin(broadcast(d0))
      .withColumn("day_idx", datediff(col("day"), col("day0")).cast("long"))
    val base = withIdx.filter(col("day_idx") < 30)
      .agg(avg("rev").as("mu0"), stddev_samp(col("rev")).as("sd0"))
    val idx = withIdx.crossJoin(broadcast(base))
    val w = Window.orderBy("day_idx").rangeBetween(-59, 0)
    idx
      .withColumn("fr",
        collect_list(struct(col("day_idx").as("k"), col("rev").as("x"))).over(w))
      .withColumn("wsum",
        expr("aggregate(fr, 0.0d, (a, e) -> a + e.x * pow(0.5, day_idx - e.k))"))
      .withColumn("wden",
        expr("aggregate(fr, 0.0d, (a, e) -> a + pow(0.5, day_idx - e.k))"))
      .withColumn("wsq",
        expr("aggregate(fr, 0.0d, (a, e) -> a + pow(0.25, day_idx - e.k))"))
      .withColumn("ewma", col("wsum") / col("wden"))
      .withColumn("half_width",
        lit(3.0) * col("sd0") * sqrt(col("wsq") / (col("wden") * col("wden"))))
      .select(col("day"), col("rev"), round(col("ewma"), 4).as("ewma"),
        round(col("mu0") + col("half_width"), 4).as("ucl"),
        round(col("mu0") - col("half_width"), 4).as("lcl"),
        (col("ewma") > col("mu0") + col("half_width") ||
          col("ewma") < col("mu0") - col("half_width")).as("out_of_control"))
      .orderBy("day")
  }

  /** Edit-distance similarity self-join (Ed-Join, Xiao et al. 2008)
    * over part names at threshold d=2 — the string-similarity join
    * q70's adjacent-pair probe and q195's blocking-key linkage cannot
    * express (those miss pairs outside the block; this one is EXACT).
    * Candidates come from the positional-q-gram prefix filter: tokens
    * are (bigram, occurrence) pairs so multiset intersection is plain
    * set intersection, every string keeps only its q·d+1 = 5 GLOBALLY
    * RAREST tokens, and any pair within distance d must share one of
    * them (each edit destroys ≤ q grams ⇒ overlap ≥ max|G|−q·d; the
    * standard prefix pigeonhole does the rest). The join runs at the
    * DISTINCT-NAME grain: row-grain pair counts are recovered
    * combinatorially (C(m,2) within a name group, m_a·m_b across),
    * which turned a 3-million-row-pair verify at sf0.1 (the column
    * holds 64 distinct values over 20k rows) into a 64-name join —
    * the dictionary-grain rewrite that makes string-similarity joins
    * survive heavy value duplication at 100 TB. The length filter and
    * the exact levenshtein verify keep the chain LOSSLESS, so the
    * judged per-distance counts are exactly the brute-force oracle's
    * row-grain numbers.
    */

  /** NEAREST-event join: for each click, the purchase by the same user
    * closest in time in EITHER direction — the bidirectional refinement
    * of as-of (backward q147 / forward q150 return the nearest on one
    * side only; "nearest sensor reading to this observation" is the
    * time-series join every alignment pipeline actually wants).
    * Composed from the custom native as-of plan run once per
    * direction — each is one merge pass over key-bucketed sorted
    * runs, zero extra shuffles on co-partitioned input — then an
    * arithmetic pick of the smaller |Δt| (ties to the backward match,
    * the as-of convention). Sentinels (-1/none) keep users with no
    * purchases visible.
    */
  def q315_nearest_event_join(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val back = graft.plans.NativeAsOfJoin.backward(clicks, purchases,
      keyCol = "user_id", leftTsCol = "us", rightTsCol = "us",
      rightTieCol = "event_id", rightPrefix = "b_")
    val both = graft.plans.NativeAsOfJoin.forward(back, purchases,
      keyCol = "user_id", leftTsCol = "us", rightTsCol = "us",
      rightTieCol = "event_id", rightPrefix = "f_")
    val db = col("us") - col("b_us")
    val df = col("f_us") - col("us")
    val pickBack = col("f_us").isNull || (col("b_us").isNotNull && db <= df)
    both.select(
        col("event_id"), col("user_id"), col("us").as("ts_us"),
        when(col("b_us").isNull && col("f_us").isNull, lit(-1L))
          .when(pickBack, col("b_event_id")).otherwise(col("f_event_id"))
          .as("near_event_id"),
        when(col("b_us").isNull && col("f_us").isNull, lit(-1L))
          .when(pickBack, db).otherwise(df).as("near_dt_us"),
        when(col("b_us").isNull && col("f_us").isNull, lit("none"))
          .when(pickBack, lit("back")).otherwise(lit("fwd")).as("direction"))
      .orderBy("event_id")
  }

  private[graft] def timeAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q04_window_rank"   -> (q04_window_rank _),
    "q13_window_running" -> (q13_window_running _),
    "q28_window_tumble" -> (q28_window_tumble _),
    "q29_sessions"      -> (q29_sessions _),
    "q32_window_slide"  -> (q32_window_slide _),
    "q38_asof_join"     -> (q38_asof_join _),
    "q44_interval_join" -> (q44_interval_join _),
    "q50_ohlc"          -> (q50_ohlc _),
    "q51_gapfill"       -> (q51_gapfill _),
    "q54_window_analytics" -> (q54_window_analytics _),
    "q59_asof_forward"  -> (q59_asof_forward _),
    "q71_rolling_window" -> (q71_rolling_window _),
    "q77_funnel"        -> (q77_funnel _),
    "q78_retention"     -> (q78_retention _),
    "q87_event_gaps"    -> (q87_event_gaps _),
    "q100_rolling_distinct" -> (q100_rolling_distinct _),
    "q111_max_concurrency" -> (q111_max_concurrency _),
    "q117_interp_linear" -> (q117_interp_linear _),
    "q118_path_analysis" -> (q118_path_analysis _),
    "q122_period_over_period" -> (q122_period_over_period _),
    "q135_funnel_lag"   -> (q135_funnel_lag _),
    "q137_lateness_audit" -> (q137_lateness_audit _),
    "q139_gap_islands"  -> (q139_gap_islands _),
    "q143_interval_coverage" -> (q143_interval_coverage _),
    "q144_trend_forecast" -> (q144_trend_forecast _),
    "q147_asof_native"  -> (q147_asof_native _),
    "q150_asof_native_fwd" -> (q150_asof_native_fwd _),
    "q151_asof_string_key" -> (q151_asof_string_key _),
    "q154_interval_attribution" -> (q154_interval_attribution _),
    "q156_seasonality"  -> (q156_seasonality _),
    "q196_funnel"       -> (q196_funnel _),
    "q197_cohort_retention" -> (q197_cohort_retention _),
    "q205_attribution"  -> (q205_attribution _),
    "q215_decayed_engagement" -> (q215_decayed_engagement _),
    "q227_cusum_drift"  -> (q227_cusum_drift _),
    "q234_acf"          -> (q234_acf _),
    "q235_linear_attribution" -> (q235_linear_attribution _),
    "q250_interval_coverage" -> (q250_interval_coverage _),
    "q256_rolling_slope" -> (q256_rolling_slope _),
    "q266_seasonal_decompose" -> (q266_seasonal_decompose _),
    "q288_session_timeout" -> (q288_session_timeout _),
    "q297_changepoint_sse" -> (q297_changepoint_sse _),
    "q303_ewma_chart"   -> (q303_ewma_chart _),
    "q315_nearest_event_join" -> (q315_nearest_event_join _),
  )

  private[graft] def timeOracle: Map[String, String] = Map(
    "q04_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q13_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q28_window_tumble" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS wstart, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    "q29_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n_events,
        |  round(sum(value), 2) AS total
        |FROM y GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "q32_window_slide" ->
      """SELECT wstart, event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '1 day', ts),
        |                 time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day']) AS wstart,
        |         event_type, value
        |  FROM events)
        |GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin,
    "q38_asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts,
        |  coalesce(r.ts, TIMESTAMP '1970-01-01') AS click_ts,
        |  coalesce(r.event_id, -1) AS click_event_id,
        |  coalesce(r.value, 0.0) AS click_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') l
        |LEFT JOIN LATERAL (
        |  SELECT ts, event_id, value FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true
        |ORDER BY l.event_id""".stripMargin,
    "q44_interval_join" ->
      """SELECT p.user_id, count(*) AS n_pairs,
        |  round(sum(c.value), 2) AS click_total
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 1800000000
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
    "q50_ohlc" ->
      """WITH e AS (
        |  SELECT user_id, ts::DATE AS day, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |      ORDER BY ts, event_id) AS rn_f,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |      ORDER BY ts DESC, event_id DESC) AS rn_l
        |  FROM events)
        |SELECT user_id, day,
        |  round(max(CASE WHEN rn_f = 1 THEN value END), 2) AS open,
        |  round(max(value), 2) AS high,
        |  round(min(value), 2) AS low,
        |  round(max(CASE WHEN rn_l = 1 THEN value END), 2) AS close,
        |  count(*) AS n_events
        |FROM e GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,
    "q51_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, ts::DATE AS day, round(sum(value), 2) AS day_total
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
        |  FROM daily GROUP BY user_id),
        |j AS (
        |  SELECT c.user_id, c.day, d.day_total,
        |    CASE WHEN d.day_total IS NULL THEN 1 ELSE 0 END AS is_gap
        |  FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day)
        |SELECT user_id, day,
        |  last_value(day_total IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS filled_total,
        |  is_gap
        |FROM j ORDER BY user_id, day""".stripMargin,
    "q54_window_analytics" ->
      """SELECT o_orderpriority, o_orderkey,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS quartile,
        |  percent_rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS cume,
        |  coalesce(nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS second_key
        |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q59_asof_forward" ->
      """SELECT l.event_id, l.user_id, l.ts,
        |  coalesce(r.ts, TIMESTAMP '1970-01-01') AS next_ts,
        |  coalesce(r.event_id, -1) AS next_event_id,
        |  coalesce(r.value, 0.0) AS next_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') l
        |LEFT JOIN LATERAL (
        |  SELECT ts, event_id, value FROM events r
        |  WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
        |    AND r.ts >= l.ts
        |  ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) r ON true
        |ORDER BY l.event_id""".stripMargin,
    "q71_rolling_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_7d,
        |  round(sum(value) OVER w, 2) AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q77_funnel" ->
      """WITH signup AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT s.user_id, s.signup_ts,
        |    max(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) AS converted
        |  FROM signup s LEFT JOIN events p
        |    ON p.user_id = s.user_id AND p.event_type = 'purchase'
        |   AND p.ts >= s.signup_ts AND p.ts <= s.signup_ts + INTERVAL 7 DAY
        |  GROUP BY s.user_id, s.signup_ts)
        |SELECT date_trunc('week', signup_ts)::DATE AS cohort_week,
        |  count(*) AS n_users, sum(converted)::BIGINT AS n_converted,
        |  floor(10000.0 * sum(converted) / count(*))::BIGINT AS conv_bp
        |FROM conv GROUP BY 1 ORDER BY cohort_week""".stripMargin,
    "q78_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS act_week FROM events)
        |SELECT c.cohort_week,
        |  floor(datediff('day', c.cohort_week, a.act_week) / 7)::INT AS week_n,
        |  count(DISTINCT c.user_id) AS n_users
        |FROM cohort c JOIN act a ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_n""".stripMargin,
    "q87_event_gaps" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |  FROM e)
        |SELECT user_id, count(*) AS n_events, max(gap) AS max_gap_us,
        |  ((max(us) - min(us)) // (count(*) - 1))::BIGINT AS avg_gap_us
        |FROM g GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin,
    "q100_rolling_distinct" ->
      """WITH e AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM e),
        |w AS (SELECT d.day, count(DISTINCT e.user_id) AS n_users_7d
        |      FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        |      GROUP BY d.day),
        |dd AS (SELECT day, count(*) AS n_users_day FROM e GROUP BY day)
        |SELECT w.day, dd.n_users_day, w.n_users_7d
        |FROM w JOIN dd USING (day) ORDER BY day""".stripMargin,
    "q111_max_concurrency" ->
      """WITH d AS (
        |  SELECT event_type, ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 300 SECOND, -1 FROM events),
        |r AS (
        |  SELECT event_type, delta,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
        |                     ROWS UNBOUNDED PRECEDING) AS run
        |  FROM d)
        |SELECT event_type, max(run)::BIGINT AS peak_concurrent,
        |  count(*) FILTER (delta = 1) AS n_sessions
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q117_interp_linear" ->
      """WITH daily AS (
        |  SELECT user_id, ts::DATE AS day,
        |    round(sum(value) * 100, 0)::BIGINT AS cents
        |  FROM events WHERE user_id < 100 GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
        |  FROM daily GROUP BY user_id),
        |j AS (SELECT c.user_id, c.day, d.cents
        |      FROM cal c LEFT JOIN daily d
        |        ON d.user_id = c.user_id AND d.day = c.day),
        |f AS (SELECT user_id, day, cents,
        |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |  first_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT user_id, day,
        |  CASE WHEN cents IS NOT NULL THEN cents
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + floor((nv - pv) * (day - pd) / (nd - pd))::BIGINT
        |       END AS est_cents,
        |  CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS interpolated
        |FROM f ORDER BY user_id, day""".stripMargin,
    "q118_path_analysis" ->
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(list(event_type ORDER BY ts, event_id)[1:3], '>') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path LIMIT 15""".stripMargin,
    "q122_period_over_period" ->
      """WITH m AS (
        |  SELECT o_orderpriority, date_trunc('month', o_orderdate)::DATE AS month,
        |    round(sum(o_totalprice) * 100, 0)::BIGINT AS cents
        |  FROM orders GROUP BY 1, 2),
        |d AS (SELECT o_orderpriority, month, cents,
        |        lag(cents) OVER (PARTITION BY o_orderpriority
        |                         ORDER BY month) AS prev_cents
        |      FROM m)
        |SELECT o_orderpriority, month, cents,
        |  coalesce(floor((cents - prev_cents) * 10000 / prev_cents)::BIGINT, 0)
        |    AS delta_bp
        |FROM d ORDER BY o_orderpriority, month""".stripMargin,
    "q135_funnel_lag" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |lag AS (
        |  SELECT ev.user_id, (min(us) - v_us) // 1000000 AS lag_sec,
        |    ev.user_id % 4 AS cohort
        |  FROM ev JOIN v ON ev.user_id = v.user_id
        |  WHERE event_type = 'purchase' AND us > v_us
        |  GROUP BY ev.user_id, v_us),
        |r AS (
        |  SELECT cohort, lag_sec,
        |    row_number() OVER (PARTITION BY cohort
        |      ORDER BY lag_sec, user_id) AS rn,
        |    count(*) OVER (PARTITION BY cohort) AS n
        |  FROM lag)
        |SELECT cohort, count(*) AS n_converted,
        |  max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN lag_sec END)
        |    AS p50_sec,
        |  max(CASE WHEN rn = greatest(1, ceil(0.9 * n)) THEN lag_sec END)
        |    AS p90_sec,
        |  max(lag_sec) AS max_sec
        |FROM r GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q137_lateness_audit" ->
      """WITH base AS (
        |  SELECT ts::DATE AS day, event_id, epoch_us(ts) AS us FROM events),
        |late AS (
        |  SELECT day, event_id,
        |    (max(us) OVER (PARTITION BY day ORDER BY event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us)
        |      // 1000000 AS late_sec
        |  FROM base),
        |r AS (
        |  SELECT day, late_sec,
        |    row_number() OVER (PARTITION BY day
        |      ORDER BY late_sec, event_id) AS rn,
        |    count(*) OVER (PARTITION BY day) AS n
        |  FROM late)
        |SELECT day, count(*) AS n_events,
        |  max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN late_sec END)
        |    AS p50_late_sec,
        |  max(CASE WHEN rn = greatest(1, ceil(0.95 * n)) THEN late_sec END)
        |    AS p95_late_sec,
        |  max(late_sec) AS max_late_sec
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q139_gap_islands" ->
      """WITH ids AS (
        |  SELECT event_id FROM events WHERE event_id % 7 <> 0),
        |r AS (
        |  SELECT event_id,
        |    event_id - row_number() OVER (ORDER BY event_id) AS island_key
        |  FROM ids),
        |i AS (SELECT island_key, count(*) AS island_len FROM r GROUP BY 1)
        |SELECT island_len, count(*) AS n_islands FROM i
        |GROUP BY island_len ORDER BY island_len""".stripMargin,
    "q143_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) - 900000000 AS s,
        |    epoch_us(ts) + 900000000 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |isl AS (
        |  SELECT user_id, s, e,
        |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m),
        |per AS (
        |  SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
        |  FROM isl GROUP BY 1, 2),
        |pu AS (
        |  SELECT user_id, count(*) AS n_islands,
        |    sum(i_e - i_s) AS covered_us
        |  FROM per GROUP BY 1)
        |SELECT user_id % 10 AS user_bucket, count(*) AS n_users,
        |  sum(n_islands)::BIGINT AS n_islands,
        |  (sum(covered_us) // 1000000)::BIGINT AS covered_sec
        |FROM pu GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "q144_trend_forecast" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    datediff('day', DATE '2024-01-01', ts::DATE) AS day,
        |    count(*)::DOUBLE AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_days,
        |  round(regr_slope(n, day), 2) AS slope,
        |  round(regr_intercept(n, day), 2) AS intercept,
        |  round(regr_intercept(n, day) + regr_slope(n, day) * 30.0, 2)
        |    AS forecast_day30
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q147_asof_native" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts)::BIGINT AS ts_us,
        |  coalesce(epoch_us(r.ts), 0)::BIGINT AS click_ts_us,
        |  coalesce(r.event_id, -1)::BIGINT AS click_event_id,
        |  round(coalesce(r."value", 0.0), 2) AS click_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') l
        |LEFT JOIN LATERAL (
        |  SELECT ts, event_id, "value" FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true
        |ORDER BY l.event_id""".stripMargin,
    "q151_asof_string_key" ->
      """SELECT l.o_orderkey, l.o_orderpriority,
        |  datediff('day', DATE '1970-01-01', l.o_orderdate)::BIGINT AS day_n,
        |  coalesce(datediff('day', DATE '1970-01-01', r.o_orderdate), 0)::BIGINT AS f_day,
        |  coalesce(r.o_orderkey, -1)::BIGINT AS f_orderkey,
        |  round(coalesce(r.o_totalprice, 0.0), 2) AS f_total
        |FROM (SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        |      WHERE o_orderstatus = 'O') l
        |LEFT JOIN LATERAL (
        |  SELECT o_orderdate, o_orderkey, o_totalprice FROM orders r
        |  WHERE r.o_orderstatus = 'F'
        |    AND r.o_orderpriority = l.o_orderpriority
        |    AND r.o_orderdate <= l.o_orderdate
        |  ORDER BY r.o_orderdate DESC, r.o_orderkey DESC LIMIT 1) r ON true
        |ORDER BY l.o_orderkey""".stripMargin,
    "q150_asof_native_fwd" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts)::BIGINT AS ts_us,
        |  coalesce(epoch_us(r.ts), 0)::BIGINT AS next_ts_us,
        |  coalesce(r.event_id, -1)::BIGINT AS next_event_id,
        |  round(coalesce(r."value", 0.0), 2) AS next_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') l
        |LEFT JOIN LATERAL (
        |  SELECT ts, event_id, "value" FROM events r
        |  WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
        |    AND r.ts >= l.ts
        |  ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) r ON true
        |ORDER BY l.event_id""".stripMargin,
    "q154_interval_attribution" ->
      """SELECT CAST(c.ts AS DATE) AS day, count(*) AS n_attrib,
        |  round(sum(p."value"), 2) AS attrib_value
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts, "value" FROM events
        |      WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q156_seasonality" ->
      """WITH h AS (
        |  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hod,
        |    count(*) AS n,
        |    CAST(sum(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hod, n,
        |  ((2 * sc * 100 + n) // (2 * n)) / 10000.0 AS avg_value,
        |  round((CAST(sc AS DOUBLE) / n) /
        |        (CAST(sum(sc) OVER (PARTITION BY event_type) AS DOUBLE) /
        |         sum(n) OVER (PARTITION BY event_type)), 4) AS season_idx,
        |  ((2 * n * 240000 + sum(n) OVER (PARTITION BY event_type)) //
        |   (2 * sum(n) OVER (PARTITION BY event_type))) / 10000.0 AS traffic_share
        |FROM h ORDER BY event_type, hod""".stripMargin,
    "q196_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |      JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t0
        |        AND e.ts <= v.t0 + INTERVAL 12 HOUR
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t1
        |        AND e.ts <= c.t1 + INTERVAL 12 HOUR
        |      GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS step, count(*)::BIGINT AS users FROM v
        |UNION ALL
        |SELECT 2, 'click_within_12h', count(*)::BIGINT FROM c
        |UNION ALL
        |SELECT 3, 'purchase_within_12h', count(*)::BIGINT FROM p
        |ORDER BY stage""".stripMargin,
    "q197_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts)::DATE AS cohort FROM events GROUP BY user_id),
        |sz AS (SELECT cohort, count(*)::BIGINT AS n0 FROM f GROUP BY cohort),
        |a AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events
        |      WHERE event_type = 'purchase')
        |SELECT f.cohort AS cohort, datediff('day', f.cohort, a.d) AS offset_d,
        |  count(*)::BIGINT AS users, round(count(*) * 1.0 / sz.n0, 4) AS retention
        |FROM f JOIN a ON a.user_id = f.user_id
        |  AND datediff('day', f.cohort, a.d) BETWEEN 0 AND 7
        |JOIN sz ON sz.cohort = f.cohort
        |GROUP BY f.cohort, offset_d, sz.n0
        |ORDER BY cohort, offset_d""".stripMargin,
    "q205_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    json_extract(props, '$.k')::BIGINT AS k, value
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'click'
        |        THEN struct_pack(cts := ts, ck := k) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastc
        |  FROM ev)
        |SELECT lastc.ck AS campaign, count(*)::BIGINT AS n_purchases,
        |  round(sum(value), 2) AS credited_value
        |FROM w
        |WHERE event_type = 'purchase' AND lastc IS NOT NULL
        |  AND lastc.cts >= ts - INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q215_decayed_engagement" ->
      """WITH p AS (SELECT user_id, value, ts::DATE AS d FROM events
        |           WHERE event_type = 'purchase'),
        |f AS (SELECT max(d) AS now FROM p)
        |SELECT user_id, count(*)::BIGINT AS n_purchases,
        |  round(sum(CAST(round(value * 100) AS BIGINT)
        |            * (1::BIGINT << (20 - least((now - d) // 7, 20))::INTEGER))
        |        / (100.0 * (1::BIGINT << 20)), 2) AS decayed_spend
        |FROM p, f
        |GROUP BY user_id
        |ORDER BY decayed_spend DESC, user_id ASC LIMIT 20""".stripMargin,
    "q227_cusum_drift" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS n FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT sum(n)::DOUBLE / count(*) AS mu FROM daily),
        |s AS (SELECT day, n,
        |    sum(n - mu) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM daily, m),
        |d AS (SELECT day, n,
        |    s - min(s) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drift
        |  FROM s)
        |SELECT day AS alarm_day, n AS day_count, round(drift, 4) AS max_drift
        |FROM d ORDER BY drift DESC, day ASC LIMIT 1""".stripMargin,
    "q234_acf" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS n FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT sum(n)::DOUBLE / count(*) AS mu FROM daily),
        |c AS (SELECT day, n - mu AS d FROM daily, m),
        |lagged AS (SELECT day, d,
        |    lag(d, 1) OVER w AS d_1, lag(d, 2) OVER w AS d_2,
        |    lag(d, 3) OVER w AS d_3, lag(d, 4) OVER w AS d_4,
        |    lag(d, 5) OVER w AS d_5, lag(d, 6) OVER w AS d_6,
        |    lag(d, 7) OVER w AS d_7
        |  FROM c WINDOW w AS (ORDER BY day)),
        |ss AS (SELECT sum(d * d) AS ss FROM lagged)
        |SELECT count(d)::BIGINT AS n_days,
        |  round(sum(d * d_1) / any_value(ss), 4) AS acf_1,
        |  round(sum(d * d_2) / any_value(ss), 4) AS acf_2,
        |  round(sum(d * d_3) / any_value(ss), 4) AS acf_3,
        |  round(sum(d * d_4) / any_value(ss), 4) AS acf_4,
        |  round(sum(d * d_5) / any_value(ss), 4) AS acf_5,
        |  round(sum(d * d_6) / any_value(ss), 4) AS acf_6,
        |  round(sum(d * d_7) / any_value(ss), 4) AS acf_7
        |FROM lagged, ss""".stripMargin,
    "q235_linear_attribution" ->
      """WITH c AS (SELECT user_id, json_extract(props, '$.k')::BIGINT AS campaign,
        |             ts AS cts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS pid, ts AS pts, value FROM events
        |      WHERE event_type = 'purchase'),
        |touches AS (SELECT campaign, round(value * 100)::BIGINT AS cents,
        |    count(*) OVER (PARTITION BY pid) AS nt
        |  FROM p JOIN c USING (user_id)
        |  WHERE cts <= pts AND cts > pts - INTERVAL 7 DAY),
        |g AS (SELECT campaign, count(*)::BIGINT AS n_touches,
        |    sum(cents * 1000000 // nt)::BIGINT AS su
        |  FROM touches GROUP BY campaign)
        |SELECT campaign, n_touches,
        |  ((su * 2 + 1000000) // 2000000) / 100.0 AS credited_value
        |FROM g ORDER BY campaign""".stripMargin,
    "q250_interval_coverage" ->
      """WITH train AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value ASC, ts ASC) AS rk
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |sizes AS (SELECT event_type, count(*)::BIGINT AS n FROM train
        |          GROUP BY event_type),
        |bounds AS (SELECT t.event_type,
        |    max(CASE WHEN rk = (n + 9) // 10 THEN value END) AS p10,
        |    max(CASE WHEN rk = (n * 9 + 9) // 10 THEN value END) AS p90
        |  FROM train t JOIN sizes s ON s.event_type = t.event_type
        |  GROUP BY t.event_type)
        |SELECT e.event_type, count(*)::BIGINT AS n_test,
        |  round(any_value(p10), 2) AS p10, round(any_value(p90), 2) AS p90,
        |  sum(CASE WHEN value >= p10 AND value <= p90 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_covered,
        |  round(sum(CASE WHEN value >= p10 AND value <= p90 THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*), 4) AS coverage
        |FROM events e JOIN bounds b ON b.event_type = e.event_type
        |WHERE e.ts >= TIMESTAMP '2024-01-16 00:00:00'
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q256_rolling_slope" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, count(*)::BIGINT AS n,
        |    (ts::DATE - DATE '2024-01-01')::BIGINT AS d
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT day, n,
        |    count(*) OVER w AS cnt, sum(d) OVER w AS sx, sum(n) OVER w AS sy,
        |    sum(d * n) OVER w AS sxy, sum(d * d) OVER w AS sxx
        |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |    AND CURRENT ROW)),
        |s AS (SELECT day, n,
        |    round((cnt * sxy - sx * sy)::DOUBLE / (cnt * sxx - sx * sx), 4) AS slope
        |  FROM r WHERE cnt = 7
        |  ORDER BY day DESC LIMIT 10)
        |SELECT day, n, slope FROM s ORDER BY day""".stripMargin,
    "q266_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT *, count(*) OVER win AS n7,
        |    sum(rev) OVER win / 7.0 AS trend
        |  FROM daily WINDOW win AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT day, rev, trend, rev - trend AS detr,
        |    dayofweek(day) AS wd FROM w WHERE n7 = 7),
        |s AS (SELECT wd, sum(detr) / count(*) AS seasonal FROM d GROUP BY wd)
        |SELECT day, rev, round(trend, 4) AS trend,
        |  round(seasonal, 4) AS seasonal,
        |  round(detr - seasonal, 4) AS resid
        |FROM d JOIN s USING (wd) ORDER BY day""".stripMargin,
    "q288_session_timeout" ->
      """WITH ev AS (SELECT user_id, event_id,
        |    floor(epoch_us(ts) / 1000000.0)::BIGINT AS t FROM events),
        |gaps AS (SELECT length(bin(t - lag(t) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id)))::BIGINT AS gap_bits
        |  FROM ev QUALIFY t - lag(t) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) IS NOT NULL),
        |b AS (SELECT gap_bits, count(*)::BIGINT AS n_gaps FROM gaps
        |  GROUP BY gap_bits),
        |tot AS (SELECT sum(n_gaps)::BIGINT AS total FROM b),
        |c AS (SELECT *, sum(n_gaps) OVER (ORDER BY gap_bits
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM b, tot)
        |SELECT gap_bits, n_gaps, round(cum::DOUBLE / total, 6) AS cum_share,
        |  (cum * 100 >= total * 95 AND (cum - n_gaps) * 100 < total * 95)
        |    AS keeps_95
        |FROM c ORDER BY gap_bits""".stripMargin,
    "q297_changepoint_sse" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS n, sum(rev) AS s1,
        |    sum(rev * rev) AS s2 FROM daily),
        |pre AS (SELECT day,
        |    count(*) OVER win::DOUBLE AS k,
        |    sum(rev) OVER win AS c1,
        |    sum(rev * rev) OVER win AS c2
        |  FROM daily WINDOW win AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (SELECT day, k, c1,
        |    (s2 - s1 * s1 / n) - (c2 - c1 * c1 / k) -
        |    ((s2 - c2) - (s1 - c1) * (s1 - c1) / (n - k)) AS gain,
        |    s1, n FROM pre, tot WHERE k < n)
        |SELECT day AS boundary_after, k::BIGINT AS n_left,
        |  round(c1 / k, 4) AS mean_left,
        |  round((s1 - c1) / (n - k), 4) AS mean_right,
        |  round(gain, 4) AS sse_gain
        |FROM g ORDER BY gain DESC, day ASC LIMIT 1""".stripMargin,
    "q303_ewma_chart" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |d0 AS (SELECT min(day) AS day0 FROM daily),
        |wi AS (SELECT day, rev,
        |    date_diff('day', day0, day)::BIGINT AS day_idx FROM daily, d0),
        |base AS (SELECT avg(rev) AS mu0, stddev_samp(rev) AS sd0
        |  FROM wi WHERE day_idx < 30),
        |idx AS (SELECT day, rev, mu0, sd0, day_idx FROM wi, base),
        |win AS (SELECT t.day, t.rev, t.mu0, t.sd0,
        |    sum(k.rev * pow(0.5, t.day_idx - k.day_idx)) AS wsum,
        |    sum(pow(0.5, t.day_idx - k.day_idx)) AS wden,
        |    sum(pow(0.25, t.day_idx - k.day_idx)) AS wsq
        |  FROM idx t JOIN idx k
        |    ON k.day_idx BETWEEN t.day_idx - 59 AND t.day_idx
        |  GROUP BY t.day, t.rev, t.mu0, t.sd0)
        |SELECT day, rev, round(wsum / wden, 4) AS ewma,
        |  round(mu0 + 3.0 * sd0 * sqrt(wsq / (wden * wden)), 4) AS ucl,
        |  round(mu0 - 3.0 * sd0 * sqrt(wsq / (wden * wden)), 4) AS lcl,
        |  (wsum / wden > mu0 + 3.0 * sd0 * sqrt(wsq / (wden * wden)) OR
        |   wsum / wden < mu0 - 3.0 * sd0 * sqrt(wsq / (wden * wden)))
        |    AS out_of_control
        |FROM win ORDER BY day""".stripMargin,
    "q315_nearest_event_join" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts)::BIGINT AS ts_us,
        |  (CASE WHEN b.event_id IS NULL AND f.event_id IS NULL THEN -1
        |       WHEN f.event_id IS NULL THEN b.event_id
        |       WHEN b.event_id IS NULL THEN f.event_id
        |       WHEN epoch_us(c.ts) - epoch_us(b.ts)
        |            <= epoch_us(f.ts) - epoch_us(c.ts) THEN b.event_id
        |       ELSE f.event_id END)::BIGINT AS near_event_id,
        |  (CASE WHEN b.event_id IS NULL AND f.event_id IS NULL THEN -1
        |       WHEN f.event_id IS NULL THEN epoch_us(c.ts) - epoch_us(b.ts)
        |       WHEN b.event_id IS NULL THEN epoch_us(f.ts) - epoch_us(c.ts)
        |       WHEN epoch_us(c.ts) - epoch_us(b.ts)
        |            <= epoch_us(f.ts) - epoch_us(c.ts)
        |         THEN epoch_us(c.ts) - epoch_us(b.ts)
        |       ELSE epoch_us(f.ts) - epoch_us(c.ts) END)::BIGINT AS near_dt_us,
        |  CASE WHEN b.event_id IS NULL AND f.event_id IS NULL THEN 'none'
        |       WHEN f.event_id IS NULL THEN 'back'
        |       WHEN b.event_id IS NULL THEN 'fwd'
        |       WHEN epoch_us(c.ts) - epoch_us(b.ts)
        |            <= epoch_us(f.ts) - epoch_us(c.ts) THEN 'back'
        |       ELSE 'fwd' END AS direction
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        |  SELECT ts, event_id FROM events r
        |  WHERE r.event_type = 'purchase' AND r.user_id = c.user_id
        |    AND r.ts <= c.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) b ON true
        |LEFT JOIN LATERAL (
        |  SELECT ts, event_id FROM events r
        |  WHERE r.event_type = 'purchase' AND r.user_id = c.user_id
        |    AND r.ts >= c.ts
        |  ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) f ON true
        |ORDER BY c.event_id""".stripMargin,
  )
}
