package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: relational core — TPC-H-style aggregation/join/window/set-op/shape queries (E1–E18 and kin).
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesCore { this: Queries.type =>

  /** E6: TPC-H Q1-shaped hash aggregation — partial+final agg, no join.
    * At 100 TB: map-side combine reduces the shuffle to
    * |groups|·|partitions| rows; grouping keys are low-cardinality.
    */
  def q01_agg_pricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** E2: broadcast hash join through two tiny dims (region/nation are
    * KB-sized at any SF — always broadcast; no shuffle of customer).
    */
  def q02_join_broadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("acctbal"))
      .orderBy("r_name")

  /** E3: large-side equi-join (orders⋈lineitem) — shuffle join on the
    * fact keys; AQE picks SMJ/SHJ. At 100 TB both sides co-partition on
    * orderkey; bucketing either table would remove the shuffle.
    */
  def q03_join_fact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** E12: global top-k — plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k·p rows, never a full sort) at any scale.
    */
  def q05_topk_orders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** E4: left outer + left semi + left anti joins. Customers with/without
    * orders. Semi/anti plan as broadcast/shuffled hash joins with
    * early-out probes — no row expansion at scale.
    */
  def q09_join_left(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(1).as("has_orders"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(0).as("has_orders"))
    withO.join(semi.union(anti), "c_custkey")
      .orderBy("c_custkey")
  }

  /** E5: range/banded join — lineitem quantity against a tiny literal
    * band dimension (broadcast nested-loop; the band table is 5 rows at
    * any scale, so the BNLJ is really a map-side lookup).
    */
  def q10_join_range(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(("b00_10", 0.0, 10.0), ("b10_20", 10.0, 20.0),
      ("b20_30", 20.0, 30.0), ("b30_40", 30.0, 40.0), ("b40_50", 40.0, 50.0))
      .toDF("band", "lo", "hi")
    t(s, dir, "lineitem")
      .join(broadcast(bands), col("l_quantity") > col("lo") && col("l_quantity") <= col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("price"))
      .orderBy("band")
  }

  /** E7: distinct + count-distinct. The distinct pair listing shuffles
    * only the (flag,status) pairs after map-side partial dedup.
    */
  def q11_distinct(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.select("l_returnflag", "l_linestatus").distinct()
      .crossJoin(broadcast(
        li.agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** E9: rollup — subtotals + grand total. NULLS FIRST ordering matches
    * Spark's asc default; DuckDB needs it spelled out.
    */
  def q12_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** E13: set operations — union all / intersect / except on key sets.
    * Intersect/except plan as semi/anti joins after partial distinct.
    */
  def q14_setops(s: SparkSession, dir: String): DataFrame = {
    val custWithOrders = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val allCust = t(s, dir, "customer").select(col("c_custkey").as("k"))
    val both = custWithOrders.intersect(allCust).select(col("k"), lit("both").as("src"))
    val orphan = custWithOrders.except(allCust).select(col("k"), lit("orphan").as("src"))
    val inactive = allCust.except(custWithOrders).select(col("k"), lit("inactive").as("src"))
    both.union(orphan).union(inactive)
      .groupBy("src").agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("src")
  }

  /** E14: string functions — lower/upper, substring, concat, length,
    * LIKE, regexp_extract. All codegen'd builtins.
    */
  def q15_strings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_name").like("%1%"))
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        upper(col("c_mktsegment")).as("useg"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).as("len"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
      .orderBy("c_custkey")

  /** E15: date/time functions — year/month/day, date_trunc, datediff
    * against a fixed anchor. All partition-prunable at scale when the
    * table is date-partitioned.
    */
  def q16_dates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"))
      .orderBy("o_orderkey")

  /** E16: math functions over lineitem measures. */
  def q17_math(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        round(abs(col("l_extendedprice") * lit(-1)), 2).as("abs_price"),
        round(pow(col("l_discount") + lit(1), 2), 6).as("disc_sq"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_tax") * lit(100)).as("tax_pct"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        (col("l_partkey") % lit(7)).as("pk_mod"))
      .orderBy("l_orderkey")

  /** E17: JSON extraction from the events.props string column —
    * `get_json_object` stays inside codegen; at scale prefer parsing
    * once (`from_json`) when multiple keys are pulled.
    */
  def q18_json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** E18: array functions over embeddings — size, element_at, lambda
    * filter/aggregate. All codegen'd; no UDFs.
    */
  def q19_arrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        round(aggregate(transform(col("embedding"), _.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4).as("vsum"))
      .orderBy("vec_id")

  /** E8: HLL approx distinct, ORACLE-JUDGED via the tolerance-flag
    * pattern (the raw HLL value is engine-specific, so it cannot be
    * hash-compared — but its ACCURACY CONTRACT can): the judged frame
    * carries the EXACT distinct counts (hash-checked against DuckDB)
    * plus booleans asserting the HLL estimate landed within the
    * documented 5% relative error (Spark's default relativeSD = 0.05),
    * which the oracle pins to literal `true`. A drifting or broken
    * sketch flips a flag and fails the hash. The estimate itself still
    * rides the plan (partial-aggregated HLL buffers — the mergeable
    * form q132 extends with DataSketches).
    */
  def q20_approx_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        approx_count_distinct(col("l_partkey")).as("apx_parts"),
        approx_count_distinct(col("l_suppkey")).as("apx_supps"))
      .select(col("n_parts"), col("n_supps"),
        (abs(col("apx_parts") - col("n_parts")).cast("double") / col("n_parts")
          <= 0.05).as("parts_apx_ok"),
        (abs(col("apx_supps") - col("n_supps")).cast("double") / col("n_supps")
          <= 0.05).as("supps_apx_ok"))

  import graft.functions.TextFunctions
  import graft.operators.Dedup

  /** E9 (cube half): full cross-tab subtotals. */
  def q31_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Skew-mitigation salted join, verified against the plain-join
    * oracle: hot o_custkey values spread across 8 salted reducers with
    * row-identical results.
    */
  def q37_skew_salted(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Skew
    val fact = t(s, dir, "orders").withColumnRenamed("o_custkey", "k")
    val dim = t(s, dir, "customer").withColumnRenamed("c_custkey", "k")
    Skew.saltedJoin(fact, dim, "k", factor = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")
  }

  /** Deterministic stratified sampling: fixed-size per-stratum sample
    * ordered by a multiplicative hash of the id — reproducible across
    * engines AND across runs/cluster sizes (no RNG, no partition-order
    * dependence), which is what a training-data pipeline needs for
    * auditable corpus draws. One shuffle on the stratum key.
    */
  def q41_sample_stratified(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(col("lang")).orderBy(h.asc, col("doc_id").asc)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select("lang", "doc_id", "rn")
      .orderBy("lang", "rn")
  }

  /** Pivot with EXPLICIT value list — compiles to one partial+final
    * aggregation (no values-discovery job, which an implicit pivot
    * would add and which cannot run at 100 TB).
    */
  def q43_pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))
      .orderBy("o_orderpriority")

  /** Grouped array aggregation: distinct order statuses per priority,
    * sorted then string-joined so row values are engine-stable (raw
    * array stringification differs between engines).
    */
  def q46_collect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy("o_orderpriority")

  /** Map-typed JSON handling (the SURVEY §1.2 `from_json`/`MapType`
    * path): props parsed ONCE into map<string,bigint>, entries exploded
    * executor-side, aggregated per key — the schema-free counterpart to
    * q18's path extraction (which re-parses per key pulled).
    */
  def q52_props_map(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    t(s, dir, "events")
      .select(from_json(col("props"), MapType(StringType, LongType)).as("m"))
      .select(explode(col("m")).as(Seq("key", "value")))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .orderBy("key")
  }

  /** E4 completion: FULL OUTER join — daily shipment revenue vs daily
    * order intake; unmatched days on either side surface with zero
    * fills. Both sides pre-aggregate BEFORE the join (the join carries
    * |days| rows, not fact rows — at 100 TB the only viable shape).
    */
  def q60_join_full(s: SparkSession, dir: String): DataFrame = {
    val ship = t(s, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(round(sum("l_extendedprice"), 2).as("ship_rev"))
    val intake = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("order_rev"))
    ship.join(intake, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("ship_rev"), lit(0.0)).as("ship_rev"),
        coalesce(col("order_rev"), lit(0.0)).as("order_rev"),
        (col("ship_rev").isNull || col("order_rev").isNull).cast("int").as("one_sided"))
      .orderBy("day")
  }

  /** Multiway fact join: lineitem ⋈ part ⋈ supplier ⋈ nation (the
    * TPC-H Q9 shape). part/supplier/nation are all dimension-sized →
    * AQE turns every join into a broadcast hash join; the fact table
    * is never shuffled. Exercises join ordering over 4 relations.
    */
  def q65_multiway_join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "p_brand")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("n_name", "p_brand")

  /** Unpivot (melt) — the inverse of q43's pivot, turning the wide
    * status counts back into (priority, status, n) rows. Executor-side
    * row generation; no shuffle beyond the pivot's own.
    */
  def q67_unpivot(s: SparkSession, dir: String): DataFrame =
    q43_pivot(s, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")),
        "status", "n")
      .orderBy("o_orderpriority", "status")

  /** Conditional + boolean aggregation: count_if / filtered sum /
    * bool_or / bool_and per event type (booleans cast to int for
    * engine-stable stringification).
    */
  def q69_conditional_aggs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count_if(col("value") > 100).as("n_big"),
        round(coalesce(sum(when(col("value") > 100, col("value"))), lit(0.0)), 2).as("sum_big"),
        bool_or(col("value") > 450).cast("int").as("any_huge"),
        bool_and(col("value") >= 0).cast("int").as("all_nonneg"))
      .orderBy("event_type")

  /** Global total-order sort — the one legitimately whole-dataset
    * ordering primitive. Spark plans it as a range-partitioning
    * exchange (sampled split points) + per-partition sort, so no task
    * ever holds more than its range slice: the 100 TB-safe shape of
    * ORDER BY, vs. the single-partition global window PlanAudit flags.
    * PlanSpec asserts the RangePartitioning exchange is really there.
    */
  def q89_global_sort(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)

  /** CMS-prefiltered exact heavy hitters (operators/HeavyHitters):
    * words occurring ≥ 930 times (about half the synthetic vocabulary
    * at the gate SF). The count-min sketch's no-undercount guarantee
    * lets the long tail skip the exact count entirely; the confirm
    * pass makes the result exactly GROUP BY ... HAVING, so a plain SQL
    * oracle verifies it.
    */
  def q94_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.HeavyHitters
    val words = tWide(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    HeavyHitters.atLeast(words, "word", threshold = 930L)
      .orderBy("word")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): key = u^(1/w) with u derived from the id by the
    * q41/q90 multiplicative hash instead of an RNG — the draw is
    * reproducible across engines, runs, and cluster sizes, and
    * auditable (given the id you can recompute why it was picked).
    * Top-k by key is TakeOrderedAndProject (per-partition heaps, no
    * global sort); weights (n_chars) bias selection toward longer
    * docs. u is built from exact integer arithmetic so both engines
    * feed pow identical doubles.
    */
  def q95_weighted_sample(s: SparkSession, dir: String): DataFrame = {
    val u = (pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)) + 1) /
      lit(4294967297.0)
    t(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .withColumn("skey", pow(u, lit(1.0) / col("n_chars")))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(50)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Incremental aggregate maintenance (materialized-view refresh):
    * the historical partition's PARTIAL aggregates (sum/count/min/max
    * — all associative) merge with the fresh partition's partials by
    * re-aggregation, never rescanning history. The oracle aggregates
    * the full table in one pass — equality is the associativity
    * guarantee incremental ETL relies on at 100 TB (avg is derived
    * from merged sum/count, never averaged across partials).
    */
  def q97_incremental_agg(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cut = lit("2024-03-01").cast("timestamp")
    def partial(df: DataFrame) = df.groupBy("event_type")
      .agg(count(lit(1)).as("pn"), sum("value").as("psum"),
        min("value").as("pmin"), max("value").as("pmax"))
    partial(ev.filter(col("ts") < cut))
      .unionByName(partial(ev.filter(col("ts") >= cut)))
      .groupBy("event_type")
      .agg(sum("pn").as("n"), round(sum("psum"), 2).as("sum_value"),
        round(min("pmin"), 2).as("min_value"), round(max("pmax"), 2).as("max_value"),
        round(sum("psum") / sum("pn"), 4).as("avg_value"))
      .orderBy("event_type")
  }

  /** Ratio-to-report: each priority's share of total revenue. The
    * grand total is a 1-row aggregate broadcast back over the group
    * rows (documented bounded nested-loop, q66's pattern) — at 100 TB
    * the per-group partials and the total come from the SAME partial
    * aggregation, so the fact table is scanned once.
    */
  def q101_share_of_total(s: SparkSession, dir: String): DataFrame = {
    val byPri = t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(sum("o_totalprice").as("rev"), count(lit(1)).as("n"))
    val total = byPri.agg(sum("rev").as("total_rev"))
    byPri.crossJoin(broadcast(total))
      .select(col("o_orderpriority"), col("n"),
        round(col("rev"), 2).as("revenue"),
        round(col("rev") / col("total_rev"), 6).as("share"))
      .orderBy("o_orderpriority")
  }

  /** Argmax aggregation: the latest event per user via max_by over a
    * (ts, event_id) struct — ONE hash aggregation holding a single
    * row of state per key, where the window-function formulation would
    * shuffle and sort every event. The tie-break key (unique event_id)
    * makes the argmax total, so no nondeterminism at equal timestamps.
    */
  def q108_argmax_latest(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("user_id") <= 200)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        max_by(
          struct(col("event_type").as("event_type"), col("value").as("value")),
          struct(col("ts"), col("event_id"))).as("last"))
      .select(
        col("user_id"), col("n_events"),
        col("last.event_type").as("last_type"),
        round(col("last.value"), 2).as("last_value"))
      .orderBy("user_id")

  /** Explicit GROUPING SETS (the general form behind q12's rollup and
    * q31's cube — per-nation and per-priority marginals plus the grand
    * total in ONE aggregation pass over an Expand, no self-union
    * rescan). ONE SQL string runs on BOTH engines (q61's pattern), so
    * the oracle is definitionally the same query; grouping() flags
    * disambiguate the all-label from a real value.
    */
  val q121Sql: String =
    """SELECT coalesce(n_name, '(all)') AS n_name,
      |  coalesce(o_orderpriority, '(all)') AS o_orderpriority,
      |  grouping(n_name) AS g_nation, grouping(o_orderpriority) AS g_prio,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
      |ORDER BY g_nation, g_prio, n_name, o_orderpriority""".stripMargin

  def q121_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(q121Sql)
  }

  /** Min-cost supplier (TPC-H Q2 shape on our star schema): per part,
    * the supplier with the lowest observed unit price. Each LINE's
    * unit cost is rounded to 4 dp IN EXACT INTEGER ARITHMETIC first
    * (q156's half-up form over exact cents — sf0.1 exposed a raw
    * double landing exactly on a half boundary, 92.40775, where
    * Spark's shortest-repr HALF_UP and DuckDB's scaled-double round
    * split), then MIN over those integers — min/max of exact integers
    * are engine-identical by construction, where an averaged or
    * raw-double cost would carry representation noise into the hash.
    * Argmin via rank-1 window over the pre-aggregated (part,supplier)
    * table (2 shuffles on the fact); part/supplier dims broadcast
    * onto the 1-row-per-part result.
    */
  def q129_min_cost_supplier(s: SparkSession, dir: String): DataFrame = {
    val cost = t(s, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(expr(
        """(2 * cast(round(l_extendedprice * 100, 0) as bigint) * 100
          |   + cast(l_quantity as bigint))
          | div (2 * cast(l_quantity as bigint))""".stripMargin))
        .as("uc4"))
    val best = cost.withColumn("rn", row_number().over(
      Window.partitionBy("l_partkey").orderBy(col("uc4"), col("l_suppkey"))))
      .filter(col("rn") === 1)
    val part = t(s, dir, "part").filter(col("p_size") >= 48)
      .select(col("p_partkey"), col("p_name"), col("p_size"))
    best.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("s_suppkey"), col("s_name"), (col("uc4") / 10000.0).as("unit_cost"))
      .orderBy("p_partkey")
  }

  /** Mergeable HLL sketches (Apache DataSketches via Spark 3.5+
    * builtins): per-day distinct-user sketches union-merged into a
    * per-type estimate next to the exact count. THE 100 TB pattern for
    * distinct-counting — daily partials are built once at ingest
    * (bounded bytes/day), and any date range is answered by merging
    * sketches instead of rescanning raw events. Estimate is
    * engine-specific → rows-only gate; Round5OpsSpec pins the estimate
    * to within 5% of exact and proves merge-associativity.
    */
  def q132_hll_merge(s: SparkSession, dir: String): DataFrame = {
    // The exact comparison column comes from q134's bitmap partials
    // (popcount of OR-merged 32-id words) — bounded bytes per group at
    // any scale, unlike a collect_set of raw ids. ORACLE-JUDGED via
    // the tolerance-flag pattern (q20's): the exact counts hash-check
    // against DuckDB; the two sketch CONTRACTS become judged booleans
    // the oracle pins to true — (a) the merged per-day-partials
    // estimate lands within 5% of exact (DataSketches' documented
    // band at default lgK), (b) merge-of-partials agrees with the
    // direct one-shot sketch within 2% (the mergeability claim — THE
    // property that makes per-day sketches the 100 TB distinct
    // pattern: range queries merge instead of rescanning).
    val ev = t(s, dir, "events")
    val merged = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_users"))
    val direct = ev
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_users"))
    val exact = ev
      .groupBy(col("event_type"), expr("user_id div 32").as("word"))
      .agg(bit_or(expr("shiftleft(1L, cast(user_id % 32 AS int))")).as("bm"))
      .groupBy("event_type")
      .agg(sum(bit_count(col("bm"))).as("exact_users"))
    merged.join(direct, "event_type").join(exact, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("merged_users") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("apx_ok"),
        (abs(col("merged_users") - col("direct_users")).cast("double") /
          col("direct_users") <= 0.02).as("merge_ok"))
      .orderBy("event_type")
  }

  /** Hierarchical ratio-to-parent rollup: nation revenue as basis
    * points of its REGION's total (the drill-down share column every
    * hierarchy report carries). Region totals re-aggregate from the
    * nation rows (25 rows — never a second fact scan) and broadcast
    * back; exact integer cents end to end.
    */
  def q141_parent_share(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum("o_totalprice") * 100, 0).cast("long").as("cents"))
    val regionTot = rev.groupBy("r_name").agg(sum("cents").as("r_cents"))
    rev.join(broadcast(regionTot), "r_name")
      .select(col("r_name"), col("n_name"), col("cents"),
        expr("cents * 10000 div r_cents").as("share_of_region_bp"))
      .orderBy("r_name", "n_name")
  }

  /** Join-cardinality audit (optimizer telemetry before a big join):
    * EXACT per-side distinct key counts and key overlap from q134's
    * bitmap partials — popcount(AND) over OR-merged words — next to
    * the actual join row count. At 100 TB you run the bitmap half for
    * pennies to predict the join's blow-up factor before committing
    * the shuffle; the actual-join column here doubles as the
    * proof-of-estimate (overlap keys ≤ join rows always).
    */
  def q145_join_cardinality(s: SparkSession, dir: String): DataFrame = {
    def bm(df: DataFrame, key: String) = df.select(
      expr(s"$key div 32").as("word"),
      expr(s"shiftleft(1L, cast($key % 32 AS int))").as("m"))
      .groupBy("word").agg(bit_or(col("m")).as("bm"))
    val l = bm(t(s, dir, "lineitem").filter(col("l_quantity") >= 45), "l_orderkey")
    val o = bm(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
      "o_orderkey")
    val sides = l.toDF("word", "bml").join(o.toDF("word", "bmo"), Seq("word"), "full")
      .agg(
        sum(bit_count(coalesce(col("bml"), lit(0L)))).as("distinct_l"),
        sum(bit_count(coalesce(col("bmo"), lit(0L)))).as("distinct_o"),
        sum(bit_count(coalesce(col("bml"), lit(0L))
          .bitwiseAND(coalesce(col("bmo"), lit(0L))))).as("key_overlap"))
    val actual = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").as("k"))
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k")), Seq("k"))
      .agg(count(lit(1)).as("join_rows"))
    sides.crossJoin(actual)
  }

  /** Per-group top-k via the typed `TopKByScore` Aggregator (UDAF) —
    * functionally q63/q76's WindowGroupLimit rank, but as an AGGREGATE
    * with O(k) state per group at every stage: partials trim to k
    * before they shuffle, no sort of the group ever happens, and it
    * composes with other aggregates in the same pass (count here).
    * Exact integer cents + id tiebreak keep it engine-deterministic.
    */
  def q146_topk_agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topk = udaf(graft.operators.TopKByScore(3))
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(topk(col("cents"), col("o_orderkey")).as("top"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"), col("n_orders"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_orderpriority"), col("n_orders"),
        (col("pos") + 1).cast("long").as("rnk"),
        col("t._1").as("cents"), col("t._2").as("o_orderkey"))
      .orderBy("o_orderpriority", "rnk")
  }

  /** RAG-style sliding-window chunking: each document split into
    * 64-token chunks with stride 48 (16-token overlap), one output row
    * per chunk with its token count and content hash. Pure per-row
    * array arithmetic (`sequence` → `explode` → `slice`) — no shuffle
    * at all until the final orderBy, so at 100 TB this is a map-only
    * pass whose output can stream straight into an embedding UDF. The
    * chunk hash is what a vector-store upsert would key on (re-chunking
    * an updated corpus only re-embeds changed hashes).
    */
  def q174_chunk_sliding(s: SparkSession, dir: String): DataFrame = {
    val C = 64
    val S = 48
    val toks = tWide(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n_chunks",
        (ceil(greatest(size(col("toks")) - C, lit(0)).cast("double") / S) + 1).cast("int"))
    toks
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"),
        col("toks"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * S + 1, lit(C)).as("ch"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ch")).as("n_toks"),
        md5(concat_ws(" ", col("ch"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Association rules (market-basket): for part pairs co-ordered >= 3
    * times, confidence(a→b) = supp(ab)/supp(a) and lift =
    * supp(ab)·N/(supp(a)·supp(b)) — q75 counts co-occurrence, this
    * turns it into the directed rule-mining output with the
    * interestingness normalization. Shape: ONE persisted basket-array
    * frame feeds all three supports — ordered pairs from the sorted
    * basket generate (the Apriori level-2 C(k,2) cost, bounded by
    * basket size, never routed through a self-join), singles from a
    * re-explode, the basket total from a count; supports broadcast
    * back onto the surviving pairs; N is a 1-row broadcast.
    */
  def q202_assoc_rules(s: SparkSession, dir: String): DataFrame = {
    // One basket shuffle feeds all three support counts: pairs from
    // the sorted-array generate (basketPairs' shape — the self-join on
    // ok it replaces shuffled the (ok, pk) frame twice and fanned out
    // basket² rows through join machinery), singles from a re-explode,
    // baskets by a count of the array frame.
    val baskets = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .persistTracked()
    val total = baskets.agg(count(lit(1)).as("total"))
    val supp1 = baskets.select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("cnt"))
    // supp(ab) IS the staged basketPairsW frame (same sorted-basket
    // generate, same (u<v, count-of-orders) grain) — consume the
    // per-dir staged parquet instead of regenerating the C(k,2) pair
    // stream, the query's dominant stage.
    val supp2 = basketPairsW(s, dir)
      .filter(col("w") >= 3)
      .select(col("u").as("pa"), col("v").as("pb"), col("w").as("both_cnt"))
    supp2
      .join(broadcast(supp1.select(col("pk").as("pa"), col("cnt").as("ca"))), "pa")
      .join(broadcast(supp1.select(col("pk").as("pb"), col("cnt").as("cb"))), "pb")
      .crossJoin(broadcast(total))
      .select(col("pa"), col("pb"), col("both_cnt"),
        round(col("both_cnt").cast("double") / col("ca"), 4).as("conf_a_to_b"),
        round(col("both_cnt").cast("double") * col("total") / (col("ca") * col("cb")), 4).as("lift"))
      .orderBy(desc("lift"), col("pa"), col("pb"))
      .limit(20)
  }

  /** RFM (recency / frequency / monetary) quintile segmentation — the
    * classic CRM cube over purchase behavior. One fact-table shuffle
    * builds the user-grain frame; each axis's quintile is q138's
    * exact-ntile integer arithmetic over PrefixSum.globalRank — the
    * user dimension is a 100 TB pipeline's LARGEST dimension, so
    * three sequential single-partition `ntile(5)` sorts of it (the
    * naive form) would be a driver-adjacent bottleneck; the two-pass
    * distributed rank keeps every axis partition-parallel. Descending
    * axes rank on the NEGATED key (freq, cents are exact longs, no
    * overflow at any realistic grain). Monetary is summed in CENTS
    * (exact 64-bit integers) so every ordering key is an integer with
    * a user_id tiebreak — summation order can never move a user
    * across a quintile boundary between engines, and the bin formula
    * (first n%5 quintiles get ⌈n/5⌉ users) reproduces `ntile(5)`
    * exactly (hash-verified against DuckDB's ntile oracle).
    */
  def q217_rfm_segments(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events").filter(col("event_type") === "purchase")
    val frontier = p.agg(max(to_date(col("ts"))).as("now"))
    val userG = p.crossJoin(broadcast(frontier))
      .groupBy("user_id")
      .agg(min(datediff(col("now"), to_date(col("ts")))).as("recency_days"),
        count(lit(1)).as("freq"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    // Lazy 1-row quintile boundaries (q138's pattern): n div 5 / n % 5
    // broadcast back; bin(r) is exact integer CASE arithmetic equal to
    // ntile(5) by definition (first `rem` bins hold q+1 rows).
    val totals = userG.agg(count(lit(1)).as("__n"))
      .select(expr("__n div 5").as("__q"), expr("__n % 5").as("__rem"))
    def quintile(r: Column): Column = {
      val q = col("__q"); val rem = col("__rem")
      (when(r <= rem * (q + 1), (r - 1) / (q + 1))
        .otherwise(rem + (r - rem * (q + 1) - 1) / q)
        .cast("long") + 1).cast("int")
    }
    val ranked = PrefixSum.globalRank(
      PrefixSum.globalRank(
        PrefixSum.globalRank(
          userG.withColumn("__nf", -col("freq")).withColumn("__nm", -col("cents")),
          Seq("recency_days", "user_id"), "__rr"),
        Seq("__nf", "user_id"), "__rf"),
      Seq("__nm", "user_id"), "__rm")
    val seg = ranked.crossJoin(broadcast(totals))
      .withColumn("r_q", quintile(col("__rr")))
      .withColumn("f_q", quintile(col("__rf")))
      .withColumn("m_q", quintile(col("__rm")))
    seg.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"),
        round(sum("cents") / lit(100.0), 2).as("segment_value"))
      .filter(col("n_users") >= 2)
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Wide pivot: the long event stream turned into one row per user
    * with a column per event type — the `.pivot()` API surface (the
    * feature-matrix shape ML joins expect). The value list is PINNED
    * (the 5 known types): an unpinned pivot runs an extra distinct
    * scan to discover columns and makes the schema data-dependent —
    * never acceptable on a 100 TB stream. Pivot compiles to ONE
    * map-side-combined aggregate with 5 conditional counts, same plan
    * as the CASE-WHEN oracle spells by hand.
    */
  def q223_pivot_events(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pv = t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pv)((df, ty) => df.withColumn(ty, coalesce(col(ty), lit(0L))))
      .withColumn("total", types.map(col).reduce(_ + _))
      .filter(col("total") >= 50)
      .orderBy("user_id")
  }

  /** Long unpivot (melt): part's numeric metrics stacked into
    * (metric, value) rows — the dual of q223 and the shape feature
    * stores and plotting layers want. Uses the native `unpivot`
    * operator (codegen'd Expand, one scan, NO shuffle until the
    * summary agg); ids stay typed, both metrics cast to the common
    * double before stacking, exactly as the UNION-ALL oracle does.
    */
  def q224_melt_metrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").cast("double").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "metric", "value")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"),
        round(min("value"), 2).as("lo"), round(max("value"), 2).as("hi"))
      .orderBy("metric")

  /** Functional-dependency audit: does p_brand functionally depend on
    * p_name (every name maps to ONE brand)? — the profiling question
    * behind normalization and golden-record keys (q218 ASSUMED block →
    * modal brand was lossy; this MEASURES how lossy). Violations =
    * determinant values with >1 distinct dependent; the report carries
    * the violating count, the worst offender, and the FD's held/total
    * ratio. Two vocabulary-sized aggregates, exact integers.
    */
  def q248_fd_check(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "part")
      .groupBy("p_name")
      .agg(count_distinct(col("p_brand")).as("n_brands"),
        count(lit(1)).as("n_rows"))
    m.agg(
        count(lit(1)).as("n_determinants"),
        sum(when(col("n_brands") > 1, 1L).otherwise(0L)).as("n_violating"),
        max("n_brands").as("worst_fanout"),
        sum(when(col("n_brands") === 1, col("n_rows")).otherwise(0L)).as("rows_fd_holds"),
        sum("n_rows").as("rows_total"))
      .withColumn("fd_strength", round(col("rows_fd_holds") / col("rows_total"), 4))
  }

  /** Storage-partitioned join (SPJ) over the custom DSv2 source: both
    * sides declare their physical layout — one planned partition per
    * id%97 residue class — through `SupportsReportPartitioning` +
    * `KeyGroupedPartitioning`, each `InputPartition` carrying its key
    * (`HasPartitionKey`), and with `spark.sql.sources.v2.bucketing
    * .enabled` Spark satisfies the join's clustered distribution
    * straight from the CONNECTOR-declared layout: the bucket
    * equi-join AND the downstream per-bucket aggregate plan ZERO
    * exchanges (Dsv2SourceSpec asserts the executed plan is
    * exchange-free). This is q155's Hive-bucketing co-location
    * generalized to the V2 connector world — the mechanism behind
    * shuffle-free joins on Iceberg/Delta partition layouts at 100 TB,
    * where the shuffle being avoided is the dominant cost. Join keys
    * must cover the partition keys for SPJ to engage (a (id,bucket)
    * join keeps its exchanges — the probe that pinned this down).
    */
  def q305_spj_join(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    def tbl(st: Long, en: Long) = s.read.format("graft.sources.SeqSource")
      .option("start", st).option("end", en).option("layout", "bucketed").load()
    val a = tbl(0, 9700).select(col("bucket"), col("cents").as("ca"))
    val b = tbl(4850, 14550).select(col("bucket"), col("cents").as("cb"))
    a.hint("merge").join(b, "bucket")
      .filter(col("bucket") < 10)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"), sum(col("ca") + col("cb")).as("sum_cents"))
      .orderBy("bucket")
  }

  /** Deep-hierarchy subtree rollup WITHOUT iteration or recursion:
    * the decimal-digit tree over custkeys (parent = key div 10 — a
    * contiguous key range makes every ancestor a real node) is rolled
    * up by PATH ENUMERATION — each row explodes its own ancestor
    * chain from pure arithmetic (key div 10^i for every power a
    * BIGINT can hold, ≤19 elements, codegen'd, no join at all), so
    * one explode + one groupBy computes every node's full subtree sum
    * in a single shuffle where the textbook recursive-CTE /
    * iterative-join plan needs depth rounds. This is the org-chart /
    * category-tree rollup shape; the fixed fan-out is what licenses
    * the closed-form chain (arbitrary graphs take the q165/q230
    * iterative route). Balances stay exact integer cents (q141's
    * rule). Output is the depth-grain profile: node count, total
    * descendant slots, max and total subtree cents per level —
    * bounded at 19 rows (the BIGINT digit width) however large the
    * key space grows.
    */
  def q331_hierarchy_rollup(s: SparkSession, dir: String): DataFrame = {
    // 10^0..10^18: the full BIGINT decimal width, so no key's chain
    // truncates (a 7-divisor cut would silently drop depth-1..(d-7)
    // ancestors of 8+-digit keys and diverge from q332's recursion).
    // Integer iteration, not math.pow: pow is only 1-ulp-accurate and
    // 1 ulp of 1e18 is 128 — the exactness claim must not ride libm.
    val divisors = Seq.iterate(1L, 19)(_ * 10).mkString(", ")
    val contrib = t(s, dir, "customer").selectExpr(
        "cast(round(c_acctbal * 100, 0) as bigint) AS cents",
        s"explode(filter(transform(array($divisors), " +
          "d -> c_custkey div d), a -> a >= 1)) AS node")
    val sub = contrib.groupBy("node")
      .agg(count(lit(1)).as("n_desc"), sum("cents").as("subtree_cents"))
    sub.groupBy(length(col("node").cast("string")).cast("long").as("depth"))
      .agg(count(lit(1)).as("n_nodes"), sum("n_desc").as("n_desc_total"),
        max("subtree_cents").as("max_subtree_cents"),
        sum("subtree_cents").as("total_cents"))
      .orderBy("depth")
  }

  /** Correlated LATERAL subquery through the SQL surface (the other
    * Spark-4 SQL door next to q332's recursion): top-3 customers by
    * balance PER NATION written as `FROM nation, LATERAL (SELECT …
    * WHERE correlated ORDER BY … LIMIT 3)` — the form every
    * SQL-first user reaches for before learning window functions.
    * The IDENTICAL text runs in DuckDB as the oracle. Catalyst
    * DECORRELATES the per-row subquery into a set-based plan (rank
    * under the hood) rather than executing it per outer row — which
    * is exactly why the surface is safe to expose; with a
    * low-cardinality outer like nation the composed per-group top-k
    * (q146's TopKAgg) remains the hand-tuned alternative. No
    * arithmetic in the output, so raw parquet doubles compare
    * bit-for-bit with ties broken by key.
    */
  def q334_lateral_topk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("q334_nation")
    t(s, dir, "customer").createOrReplaceTempView("q334_customer")
    s.sql(lateralTopkSql("q334_nation", "q334_customer"))
  }

  private[graft] def coreAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing"   -> (q01_agg_pricing _),
    "q02_join_broadcast" -> (q02_join_broadcast _),
    "q03_join_fact"     -> (q03_join_fact _),
    "q05_topk_orders"   -> (q05_topk_orders _),
    "q09_join_left"     -> (q09_join_left _),
    "q10_join_range"    -> (q10_join_range _),
    "q11_distinct"      -> (q11_distinct _),
    "q12_rollup"        -> (q12_rollup _),
    "q14_setops"        -> (q14_setops _),
    "q15_strings"       -> (q15_strings _),
    "q16_dates"         -> (q16_dates _),
    "q17_math"          -> (q17_math _),
    "q18_json"          -> (q18_json _),
    "q19_arrays"        -> (q19_arrays _),
    "q20_approx_distinct" -> (q20_approx_distinct _),
    "q31_cube"          -> (q31_cube _),
    "q37_skew_salted"   -> (q37_skew_salted _),
    "q41_sample_stratified" -> (q41_sample_stratified _),
    "q43_pivot"         -> (q43_pivot _),
    "q46_collect"       -> (q46_collect _),
    "q52_props_map"     -> (q52_props_map _),
    "q60_join_full"     -> (q60_join_full _),
    "q65_multiway_join" -> (q65_multiway_join _),
    "q67_unpivot"       -> (q67_unpivot _),
    "q69_conditional_aggs" -> (q69_conditional_aggs _),
    "q89_global_sort"   -> (q89_global_sort _),
    "q94_heavy_hitters" -> (q94_heavy_hitters _),
    "q95_weighted_sample" -> (q95_weighted_sample _),
    "q97_incremental_agg" -> (q97_incremental_agg _),
    "q101_share_of_total" -> (q101_share_of_total _),
    "q108_argmax_latest" -> (q108_argmax_latest _),
    "q121_grouping_sets" -> (q121_grouping_sets _),
    "q129_min_cost_supplier" -> (q129_min_cost_supplier _),
    "q132_hll_merge"    -> (q132_hll_merge _),
    "q141_parent_share" -> (q141_parent_share _),
    "q145_join_cardinality" -> (q145_join_cardinality _),
    "q146_topk_agg"     -> (q146_topk_agg _),
    "q174_chunk_sliding" -> (q174_chunk_sliding _),
    "q202_assoc_rules"  -> (q202_assoc_rules _),
    "q217_rfm_segments" -> (q217_rfm_segments _),
    "q223_pivot_events" -> (q223_pivot_events _),
    "q224_melt_metrics" -> (q224_melt_metrics _),
    "q248_fd_check"     -> (q248_fd_check _),
    "q305_spj_join"     -> (q305_spj_join _),
    "q331_hierarchy_rollup" -> (q331_hierarchy_rollup _),
    "q334_lateral_topk" -> (q334_lateral_topk _),
  )

  private[graft] def coreOracle: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_broadcast" ->
      """SELECT r_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q03_join_fact" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q09_join_left" ->
      """SELECT c.c_custkey,
        |  count(o.o_orderkey) AS n_orders,
        |  CASE WHEN count(o.o_orderkey) > 0 THEN 1 ELSE 0 END AS has_orders
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin,
    "q10_join_range" ->
      """SELECT b.band, count(*) AS n, round(sum(l_extendedprice), 2) AS price
        |FROM lineitem
        |JOIN (VALUES ('b00_10', 0.0, 10.0), ('b10_20', 10.0, 20.0),
        |             ('b20_30', 20.0, 30.0), ('b30_40', 30.0, 40.0),
        |             ('b40_50', 40.0, 50.0)) AS b(band, lo, hi)
        |  ON l_quantity > b.lo AND l_quantity <= b.hi
        |GROUP BY b.band ORDER BY b.band""".stripMargin,
    "q11_distinct" ->
      """SELECT d.l_returnflag, d.l_linestatus, a.n_parts, a.n_supps
        |FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) d
        |CROSS JOIN (SELECT count(DISTINCT l_partkey) AS n_parts,
        |                   count(DISTINCT l_suppkey) AS n_supps FROM lineitem) a
        |ORDER BY d.l_returnflag, d.l_linestatus""".stripMargin,
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q14_setops" ->
      """WITH cwo AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |     ac AS (SELECT c_custkey AS k FROM customer),
        |     tagged AS (
        |       SELECT k, 'both' AS src FROM (SELECT k FROM cwo INTERSECT SELECT k FROM ac)
        |       UNION ALL
        |       SELECT k, 'orphan' AS src FROM (SELECT k FROM cwo EXCEPT SELECT k FROM ac)
        |       UNION ALL
        |       SELECT k, 'inactive' AS src FROM (SELECT k FROM ac EXCEPT SELECT k FROM cwo))
        |SELECT src, count(*) AS n, min(k) AS min_k, max(k) AS max_k
        |FROM tagged GROUP BY src ORDER BY src""".stripMargin,
    "q15_strings" ->
      """SELECT c_custkey, lower(c_name) AS lname, upper(c_mktsegment) AS useg,
        |  substring(c_name, 1, 8) AS prefix, length(c_name) AS len,
        |  concat_ws('|', c_mktsegment, c_name) AS tagged,
        |  coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,
    "q16_dates" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  date_diff('day', o_orderdate::DATE, DATE '1998-01-01') AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q17_math" ->
      """SELECT l_orderkey,
        |  round(abs(l_extendedprice * -1), 2) AS abs_price,
        |  round(power(l_discount + 1, 2), 6) AS disc_sq,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  l_partkey % 7 AS pk_mod
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "q18_json" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q19_arrays" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(embedding[1]::DOUBLE, 6) AS first,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  round(list_sum(embedding::DOUBLE[]), 4) AS vsum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q31_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q37_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q41_sample_stratified" ->
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "q43_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q46_collect" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  count(DISTINCT o_orderstatus) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q52_props_map" ->
      """SELECT k.key, count(*) AS n,
        |  sum(json_extract(props::JSON, '$.' || k.key)::BIGINT)::BIGINT AS total
        |FROM events
        |CROSS JOIN unnest(json_keys(props::JSON)) AS k(key)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q60_join_full" ->
      """WITH ship AS (
        |  SELECT l_shipdate::DATE AS day, round(sum(l_extendedprice), 2) AS ship_rev
        |  FROM lineitem GROUP BY 1),
        |intake AS (
        |  SELECT o_orderdate::DATE AS day, round(sum(o_totalprice), 2) AS order_rev
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(s.day, i.day) AS day,
        |  coalesce(s.ship_rev, 0.0) AS ship_rev,
        |  coalesce(i.order_rev, 0.0) AS order_rev,
        |  CASE WHEN s.day IS NULL OR i.day IS NULL THEN 1 ELSE 0 END AS one_sided
        |FROM ship s FULL JOIN intake i ON s.day = i.day
        |ORDER BY day""".stripMargin,
    "q65_multiway_join" ->
      """SELECT n_name, p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, p_brand ORDER BY n_name, p_brand""".stripMargin,
    "q67_unpivot" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |    count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |    count(*) FILTER (o_orderstatus = 'P') AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_f' AS status, n_f AS n FROM p
        |UNION ALL
        |SELECT o_orderpriority, 'n_o', n_o FROM p
        |UNION ALL
        |SELECT o_orderpriority, 'n_p', n_p FROM p
        |ORDER BY o_orderpriority, status""".stripMargin,
    "q69_conditional_aggs" ->
      """SELECT event_type,
        |  count(*) FILTER (value > 100) AS n_big,
        |  round(coalesce(sum(value) FILTER (value > 100), 0.0), 2) AS sum_big,
        |  bool_or(value > 450)::INT AS any_huge,
        |  bool_and(value >= 0)::INT AS all_nonneg
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q89_global_sort" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q94_heavy_hitters" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE length(word) > 0
        |GROUP BY word HAVING count(*) >= 930 ORDER BY word""".stripMargin,
    "q95_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |    pow((((doc_id * 2654435761) % 4294967296) + 1) / 4294967297.0,
        |        1.0 / n_chars) AS skey
        |  FROM documents WHERE n_chars > 0),
        |s AS (SELECT doc_id, lang, n_chars FROM d
        |      ORDER BY skey DESC, doc_id ASC LIMIT 50)
        |SELECT doc_id, lang, n_chars FROM s ORDER BY doc_id""".stripMargin,
    "q97_incremental_agg" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value,
        |  round(sum(value) / count(*), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q101_share_of_total" ->
      """WITH p AS (
        |  SELECT o_orderpriority, sum(o_totalprice) AS rev, count(*) AS n
        |  FROM orders GROUP BY o_orderpriority),
        |t AS (SELECT sum(rev) AS total_rev FROM p)
        |SELECT o_orderpriority, n, round(rev, 2) AS revenue,
        |  round(rev / total_rev, 6) AS share
        |FROM p CROSS JOIN t ORDER BY o_orderpriority""".stripMargin,
    "q108_argmax_latest" ->
      """WITH r AS (
        |  SELECT user_id, event_type, value,
        |    count(*) OVER (PARTITION BY user_id) AS n_events,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id <= 200)
        |SELECT user_id, n_events, event_type AS last_type,
        |  round(value, 2) AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q121_grouping_sets" -> Queries.q121Sql,
    "q129_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min((2 * CAST(round(l_extendedprice * 100) AS BIGINT) * 100
        |         + CAST(l_quantity AS BIGINT))
        |        // (2 * CAST(l_quantity AS BIGINT))) AS uc4
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (
        |  SELECT * FROM (SELECT *, row_number()
        |      OVER (PARTITION BY l_partkey
        |            ORDER BY uc4, l_suppkey) AS rn
        |    FROM cost) WHERE rn = 1)
        |SELECT p_partkey, p_name, p_size, s_suppkey, s_name,
        |  uc4 / 10000.0 AS unit_cost
        |FROM best
        |JOIN part ON l_partkey = p_partkey AND p_size >= 48
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY p_partkey""".stripMargin,
    "q141_parent_share" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    round(sum(o_totalprice) * 100, 0)::BIGINT AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT r_name, sum(cents)::BIGINT AS r_cents
        |       FROM rev GROUP BY 1)
        |SELECT rev.r_name, n_name, cents,
        |  (cents * 10000) // r_cents AS share_of_region_bp
        |FROM rev JOIN rt ON rev.r_name = rt.r_name
        |ORDER BY rev.r_name, n_name""".stripMargin,
    "q145_join_cardinality" ->
      """WITH l AS (
        |  SELECT l_orderkey // 32 AS word,
        |    bit_or(1::BIGINT << (l_orderkey % 32)::INT) AS bml
        |  FROM lineitem WHERE l_quantity >= 45 GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey // 32 AS word,
        |    bit_or(1::BIGINT << (o_orderkey % 32)::INT) AS bmo
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |sides AS (
        |  SELECT
        |    sum(bit_count(coalesce(bml, 0)))::BIGINT AS distinct_l,
        |    sum(bit_count(coalesce(bmo, 0)))::BIGINT AS distinct_o,
        |    sum(bit_count(coalesce(bml, 0) & coalesce(bmo, 0)))::BIGINT
        |      AS key_overlap
        |  FROM l FULL JOIN o USING (word)),
        |actual AS (
        |  SELECT count(*) AS join_rows
        |  FROM (SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 45) a
        |  JOIN (SELECT o_orderkey AS k FROM orders
        |        WHERE o_orderpriority = '1-URGENT') b USING (k))
        |SELECT * FROM sides, actual""".stripMargin,
    "q146_topk_agg" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    round(o_totalprice * 100, 0)::BIGINT AS cents, o_orderkey,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n_orders,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY round(o_totalprice * 100, 0)::BIGINT DESC,
        |               o_orderkey) AS rnk
        |  FROM orders)
        |SELECT o_orderpriority, n_orders::BIGINT AS n_orders, rnk::BIGINT AS rnk,
        |  cents, o_orderkey
        |FROM o WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "q174_chunk_sliding" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |nz AS (
        |  SELECT doc_id, toks,
        |    (CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS BIGINT) + 1) AS n_chunks
        |  FROM d WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_idx, toks
        |  FROM nz)
        |SELECT doc_id, chunk_idx,
        |  len(toks[chunk_idx*48+1 : chunk_idx*48+64]) AS n_toks,
        |  md5(array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q202_assoc_rules" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS total FROM op),
        |supp1 AS (SELECT pk, count(*)::BIGINT AS cnt FROM op GROUP BY pk),
        |supp2 AS (SELECT a.pk AS pa, b.pk AS pb, count(*)::BIGINT AS both_cnt
        |          FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |          GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT s2.pa, s2.pb, s2.both_cnt,
        |  round(s2.both_cnt * 1.0 / sa.cnt, 4) AS conf_a_to_b,
        |  round((s2.both_cnt * 1.0 * n.total) / (sa.cnt * sb.cnt), 4) AS lift
        |FROM supp2 s2
        |JOIN supp1 sa ON sa.pk = s2.pa
        |JOIN supp1 sb ON sb.pk = s2.pb
        |CROSS JOIN n
        |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin,
    "q217_rfm_segments" ->
      """WITH p AS (SELECT user_id, value, ts::DATE AS d FROM events
        |           WHERE event_type = 'purchase'),
        |f AS (SELECT max(d) AS now FROM p),
        |u AS (SELECT user_id,
        |    min(now - d)::BIGINT AS recency_days,
        |    count(*)::BIGINT AS freq,
        |    sum(round(value * 100, 0)::BIGINT)::BIGINT AS cents
        |  FROM p, f GROUP BY user_id, now),
        |seg AS (SELECT *,
        |    ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_q,
        |    ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS f_q,
        |    ntile(5) OVER (ORDER BY cents DESC, user_id ASC) AS m_q
        |  FROM u)
        |SELECT r_q, f_q, m_q, count(*)::BIGINT AS n_users,
        |  round(sum(cents) / 100.0, 2) AS segment_value
        |FROM seg GROUP BY r_q, f_q, m_q
        |HAVING count(*) >= 2
        |ORDER BY r_q, f_q, m_q""".stripMargin,
    "q223_pivot_events" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
        |  count(*)::BIGINT AS total
        |FROM events
        |GROUP BY user_id HAVING count(*) >= 50
        |ORDER BY user_id""".stripMargin,
    "q224_melt_metrics" ->
      """WITH long AS (
        |  SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice::DOUBLE FROM part)
        |SELECT metric, count(*)::BIGINT AS n, round(sum(value), 2) AS total,
        |  round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM long GROUP BY metric ORDER BY metric""".stripMargin,
    "q248_fd_check" ->
      """WITH m AS (
        |  SELECT p_name, count(DISTINCT p_brand)::BIGINT AS n_brands,
        |    count(*)::BIGINT AS n_rows
        |  FROM part GROUP BY p_name)
        |SELECT count(*)::BIGINT AS n_determinants,
        |  sum(CASE WHEN n_brands > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
        |  max(n_brands)::BIGINT AS worst_fanout,
        |  sum(CASE WHEN n_brands = 1 THEN n_rows ELSE 0 END)::BIGINT AS rows_fd_holds,
        |  sum(n_rows)::BIGINT AS rows_total,
        |  round(sum(CASE WHEN n_brands = 1 THEN n_rows ELSE 0 END)::DOUBLE
        |        / sum(n_rows), 4) AS fd_strength
        |FROM m""".stripMargin,
    "q305_spj_join" ->
      """WITH a AS (SELECT id % 97 AS bucket,
        |    (id * 2654435761) % 1000003 AS ca FROM range(0, 9700) t(id)),
        |b AS (SELECT id % 97 AS bucket,
        |    (id * 2654435761) % 1000003 AS cb FROM range(4850, 14550) t(id))
        |SELECT bucket, count(*)::BIGINT AS n_pairs,
        |  sum(ca + cb)::BIGINT AS sum_cents
        |FROM a JOIN b USING (bucket) WHERE bucket < 10
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q331_hierarchy_rollup" ->
      """WITH a AS (SELECT round(c_acctbal * 100, 0)::BIGINT AS cents,
        |    unnest(list_filter([c_custkey // 1, c_custkey // 10,
        |      c_custkey // 100, c_custkey // 1000, c_custkey // 10000,
        |      c_custkey // 100000, c_custkey // 1000000,
        |      c_custkey // 10000000, c_custkey // 100000000,
        |      c_custkey // 1000000000, c_custkey // 10000000000,
        |      c_custkey // 100000000000, c_custkey // 1000000000000,
        |      c_custkey // 10000000000000, c_custkey // 100000000000000,
        |      c_custkey // 1000000000000000, c_custkey // 10000000000000000,
        |      c_custkey // 100000000000000000,
        |      c_custkey // 1000000000000000000],
        |      x -> x >= 1)) AS node
        |  FROM customer),
        |n AS (SELECT node, count(*)::BIGINT AS n_desc,
        |    sum(cents)::BIGINT AS subtree_cents
        |  FROM a GROUP BY 1)
        |SELECT length(node::VARCHAR)::BIGINT AS depth,
        |  count(*)::BIGINT AS n_nodes, sum(n_desc)::BIGINT AS n_desc_total,
        |  max(subtree_cents) AS max_subtree_cents,
        |  sum(subtree_cents)::BIGINT AS total_cents
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q334_lateral_topk" -> lateralTopkSql("nation", "customer"),
    "q132_hll_merge" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users,
        |  true AS apx_ok, true AS merge_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey)::BIGINT AS n_parts,
        |  count(DISTINCT l_suppkey)::BIGINT AS n_supps,
        |  true AS parts_apx_ok, true AS supps_apx_ok
        |FROM lineitem""".stripMargin,
  )
}
