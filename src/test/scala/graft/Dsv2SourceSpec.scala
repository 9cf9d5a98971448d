package graft

import org.apache.spark.sql.functions._

/** The custom DataSource V2 (sources/SeqSource.scala) pinned on all
  * three axes a real columnar source must get right: generation
  * correctness (differential vs a spark.range reconstruction), filter
  * pushdown (scan bounds provably narrowed BEFORE partition planning),
  * and column pruning (reader materializes only the projected schema).
  */
class Dsv2SourceSpec extends SparkSpec {

  private def seq(end: Long, slices: Int = 32) =
    spark.read.format("graft.sources.SeqSource")
      .option("start", 0L).option("end", end).option("slices", slices)
      .load()

  private def expected(end: Long) =
    spark.range(0, end).select(
      col("id"),
      (col("id") % 97).as("bucket"),
      (col("id") * 2654435761L % 1000003L).as("cents"),
      concat(lit("w"), col("id") % 13).as("word"))

  test("full read reproduces the arithmetic spec exactly") {
    val got = seq(10000).collect().map(_.toString).sorted
    val want = expected(10000).collect().map(_.toString).sorted
    assert(got.length == 10000 && got.sameElements(want))
  }

  test("id-range predicates narrow the planned scan bounds (pushdown before partitioning)") {
    val df = seq(1000000).filter(col("id") >= 400000L && col("id") < 400100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[400000,400100)"),
      s"bounds not narrowed by pushdown:\n$plan")
    assert(plan.contains("pushed=") && plan.contains("GreaterThanOrEqual(id,400000)"),
      s"pushed filters not surfaced:\n$plan")
    assert(df.count() == 100)
    // An unsatisfiable range plans ZERO partitions and still answers.
    assert(seq(1000000).filter(col("id") < 0L).count() == 0)
  }

  test("non-id predicates are NOT pushed and still evaluate correctly") {
    val df = seq(10000).filter(col("bucket") === 3L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,10000)"), s"bounds must stay full:\n$plan")
    assert(df.count() == expected(10000).filter(col("bucket") === 3L).count())
  }

  test("column pruning reaches the reader") {
    val df = seq(5000).select(sum(col("cents")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=cents"), s"reader not pruned to cents:\n$plan")
    val want = expected(5000).agg(sum("cents")).head.getLong(0)
    assert(df.head.getLong(0) == want)
  }

  test("complete aggregate pushdown: closed-form answer, no aggregate exec, O(1) at a trillion rows") {
    // A TRILLION-row range: only answerable at all because the source
    // answers COUNT/MIN/MAX/SUM over its (filter-narrowed) bounds in
    // closed form — zero rows are generated.
    val df = spark.read.format("graft.sources.SeqSource")
      .option("start", 0L).option("end", 1000000000000L).option("slices", 32)
      .load()
      .filter(col("id") >= 100L && col("id") < 1000000000100L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("id")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg="), s"aggregation not pushed:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"aggregate exec should be elided on complete pushdown:\n$plan")
    val r = df.head
    val n = 1000000000000L - 100L // bounds clamp at end=1e12
    assert(r.getLong(0) == n && r.getLong(1) == 100L && r.getLong(2) == 1000000000000L - 1)
    // Gauss sum mod 2^64 (Spark's non-ANSI integral sum wraps the same way)
    val want = ((BigInt(100L) + BigInt(1000000000000L - 1)) * BigInt(n) / 2).toLong
    assert(r.getLong(3) == want)
  }

  test("untranslatable aggregates refuse pushdown (sum over a derived column)") {
    val df = seq(10000).agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedAgg="), s"mixed agg must NOT be pushed:\n$plan")
    assert(plan.contains("HashAggregate"), s"Spark must keep the aggregate:\n$plan")
    val r = df.head
    assert(r.getLong(1) == 10000L &&
      r.getLong(0) == expected(10000).agg(sum("cents")).head.getLong(0))
  }

  test("GROUP BY bucket pushes COMPLETELY: 97 rows of closed-form arithmetic, no aggregate exec") {
    val df = seq(10000).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("id")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=") && plan.contains("groupBy=bucket"),
      s"grouped agg over bucket must push completely:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"aggregate exec should be elided on complete grouped pushdown:\n$plan")
    val got = df.orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = expected(10000).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("id")).as("s"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.sameElements(want))
    // A range shorter than 97 ids yields only the populated classes.
    val short = seq(10L).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    assert(short.count() == 10L)
  }

  test("group-by on a non-bucket column refuses pushdown and stays correct") {
    val df = seq(10000).groupBy(col("word")).agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedAgg="), s"word grouping must NOT be pushed:\n$plan")
    assert(df.agg(sum("n")).head.getLong(0) == 10000L && df.count() == 13)
  }

  test("pushed aggregation over an empty (unsatisfiable) range yields SQL empty-input semantics") {
    val r = seq(1000).filter(col("id") < 0L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"), sum(col("id")).as("s"))
      .head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("result is slice-count invariant (partitioning is pure planning)") {
    val a = seq(30000, slices = 1).agg(sum("cents"), count(lit(1))).head
    val b = seq(30000, slices = 17).agg(sum("cents"), count(lit(1))).head
    val c = seq(30000, slices = 64).agg(sum("cents"), count(lit(1))).head
    assert(a == b && b == c)
    assert(seq(30000, slices = 17).rdd.getNumPartitions == 17)
  }

  // ---- bucketed layout / storage-partitioned join ----------------------

  private def bucketed(start: Long, end: Long) =
    spark.read.format("graft.sources.SeqSource")
      .option("start", start).option("end", end)
      .option("layout", "bucketed").load()

  test("bucketed layout: same rows as the range layout, incl. a start not on a bucket boundary") {
    // 4850 % 97 = 0 would hide stride-start bugs; 4851 % 97 = 1 doesn't.
    val got = bucketed(4851L, 14551L).orderBy("id").collect()
    val want = expected(14551L).filter(col("id") >= 4851L).orderBy("id").collect()
    assert(got.length == want.length)
    assert(got.sameElements(want))
    assert(bucketed(0L, 9700L).rdd.getNumPartitions == 97)
  }

  test("storage-partitioned join: bucket join and per-bucket agg plan ZERO exchanges") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val a = bucketed(0L, 9700L).select(col("bucket"), col("cents").as("ca"))
    val b = bucketed(4850L, 14550L).select(col("bucket"), col("cents").as("cb"))
    val j = a.hint("merge").join(b, "bucket")
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum(col("ca") + col("cb")).as("s"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"SPJ must satisfy the join AND the agg from the connector-declared layout:\n$plan")
    // Correctness: 100 ids/bucket on each side → 10k pairs per bucket.
    assert(j.count() == 97L)
    assert(j.filter(col("n") =!= 10000L).count() == 0L)
  }

  // ---- vectorized (columnar) read path ---------------------------------

  private def vec(end: Long) =
    spark.read.format("graft.sources.SeqSource")
      .option("start", 0L).option("end", end)
      .option("vectorized", "true").load()

  test("vectorized scan: ColumnarToRow in the plan, bitwise row parity with the row reader") {
    val df = vec(50000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"vectorized scan must surface ColumnarToRow:\n$plan")
    assert(plan.contains("vectorized=true"), s"scan description must flag it:\n$plan")
    val got = df.orderBy("id").collect()
    val want = seq(50000L).orderBy("id").collect()
    assert(got.sameElements(want))
    // Partial trailing batch (50000 % 4096 != 0) must not repeat rows.
    assert(df.count() == 50000L && df.select("id").distinct().count() == 50000L)
  }

  test("vectorized scan composes with pushdown and pruning") {
    val df = vec(100000L).filter(col("id") >= 90000L).select("word")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("bounds=[90000,100000)"), scan)
    assert(scan.contains("cols=word"), scan)
    assert(df.count() == 10000L)
  }

  test("runtime filtering: the dimension's live keys prune the bucketed scan to 5 of 97 partitions") {
    // Dynamic partition pruning through SupportsRuntimeFiltering: the
    // broadcast dim side runs first, its surviving bucket keys reach
    // SeqBucketedScan.filter as an IN filter, and the re-planned scan
    // must touch ONLY those residue classes.
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val fact = spark.read.format("graft.sources.SeqSource")
      .option("start", 0L).option("end", 97000L)
      .option("layout", "bucketed").load()
    val dim = spark.range(0, 97).toDF("bucket").filter(col("bucket") % 19 === 3)
    val j = fact.join(broadcast(dim), Seq("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val got = j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // buckets {3, 22, 41, 60, 79}: 97000 ids cover each residue 1000x.
    assert(got == Map(3L -> 1000L, 22L -> 1000L, 41L -> 1000L,
      60L -> 1000L, 79L -> 1000L), s"got $got")
    // The executed scan instance was runtime-filtered: re-planning it
    // yields exactly the 5 surviving partitions (and the plan carries
    // the runtime-filter subquery).
    // AQE hides subplans behind leaf wrappers (AdaptiveSparkPlanExec,
    // QueryStageExec) that plain collect() does not descend into.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => flatten(q.plan)
        case _ => Seq.empty
      }))
    val scans = flatten(j.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.SeqBucketedScan] => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec over SeqBucketedScan")
    assert(scans.head.runtimeFilters.nonEmpty,
      "expected a dynamic-pruning runtime filter on the scan")
    val planned = scans.head.scan.asInstanceOf[graft.sources.SeqBucketedScan]
      .planInputPartitions().length
    assert(planned == 5, s"runtime filter must prune to 5 partitions, planned $planned")
  }

  test("limit pushdown narrows the planned bounds; Spark's own limit stays above (partial)") {
    val df = seq(1000000L).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,7)"), s"limit must narrow the scan bounds:\n$plan")
    assert(df.count() == 7)
  }

  test("top-N on id DESC keeps only the top slice of a billion-row range; rows exact") {
    val df = spark.read.format("graft.sources.SeqSource")
      .option("start", 0L).option("end", 1000000000L).option("slices", 32).load()
      .orderBy(col("id").desc).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[999999995,1000000000)"),
      s"top-N must narrow to the LAST n of the range:\n$plan")
    val got = df.collect().map(_.getLong(0))
    assert(got.toSeq == Seq(999999999L, 999999998L, 999999997L, 999999996L, 999999995L))
  }

  test("top-N on id ASC keeps the first slice; top-N on a derived column refuses pushdown") {
    val asc = seq(1000000L).orderBy(col("id")).limit(3)
    assert(asc.queryExecution.executedPlan.toString.contains("bounds=[0,3)"))
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // cents ordering is not monotone in id — the builder must refuse,
    // and the full range stays planned.
    val byCents = seq(1000L).orderBy(col("cents")).limit(3)
    val plan = byCents.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,1000)"),
      s"non-id top-N must not narrow the scan:\n$plan")
    val expect = (0L until 1000L).sortBy(i => (graft.sources.SeqSource.centsOf(i), i)).take(3)
      .map(i => graft.sources.SeqSource.centsOf(i)).toSeq
    assert(byCents.collect().map(_.getAs[Long]("cents")).toSeq == expect)
  }

  test("bucketed scan without v2 bucketing conf still returns correct rows (layout is advisory)") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val n = bucketed(0L, 9700L).groupBy("bucket").count()
      assert(n.count() == 97L && n.filter(col("count") =!= 100L).count() == 0L)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }
}
