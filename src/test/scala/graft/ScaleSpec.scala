package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Components, PageRank, PrefixSum}

/** Beyond-toy-size checks: the scale-sensitive operators run on
  * generated inputs a few orders of magnitude past the driver
  * fixtures, partitioned the way a real cluster would see them
  * (`spark.range` is uniformly split across cores). These are not
  * benchmarks — they assert CORRECTNESS survives real partition
  * counts, spills, and multi-round convergence at sizes where a
  * driver-side or single-partition implementation would blow up.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("prefix sum over 2M rows (distributed path) matches a closed form") {
    // v(i) = i % 97 → cum(n) has a closed form: full cycles + remainder
    val df = spark.range(2000000).select(col("id"), (col("id") % 97).as("v"))
    val got = PrefixSum.runningTotal(df, "id", "v", "cum", smallInputBytes = 0)
    def closed(n: Long): Long = { // inclusive sum of i%97 for i in 0..n
      val c = (n + 1) / 97; val r = (n + 1) % 97
      c * (96 * 97 / 2) + r * (r - 1) / 2
    }
    val sample = got.filter(col("id").isin(0L, 96L, 97L, 999999L, 1999999L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    sample.foreach { case (id, cum) =>
      assert(cum == closed(id), s"id=$id got=$cum want=${closed(id)}")
    }
    assert(got.count() == 2000000)
  }

  test("globalRank over 1M rows (distributed path) is a bijection matching the order") {
    // order key = (id*2654435761) % 2^32 — a permutation-ish scatter,
    // unique composite order via (h, id); rank of a row must equal the
    // count of rows ordered strictly before it
    val df = spark.range(1000000)
      .select(col("id"), pmod(col("id") * 2654435761L, lit(4294967296L)).as("h"))
    val got = PrefixSum.globalRank(df, Seq("h", "id"), "r", smallInputBytes = 0)
    assert(got.agg(min("r"), max("r"), countDistinct("r"))
      .as[(Long, Long, Long)].head() == ((1L, 1000000L, 1000000L)))
    // spot-check: rank == 1 + #rows with smaller (h, id)
    val probe = got.filter(col("id").isin(0L, 12345L, 999999L))
      .select("h", "id", "r").as[(Long, Long, Long)].collect()
    probe.foreach { case (h, id, r) =>
      val before = df.filter(col("h") < h || (col("h") === h && col("id") < id)).count()
      assert(r == before + 1, s"id=$id")
    }
  }

  test("connected components on a 100k-edge graph with planted structure") {
    // 10k disjoint 10-node rings: component of node i = (i/10)*10.
    val edges = spark.range(100000).select(
      col("id").as("a"),
      (col("id") - (col("id") % 10) + (col("id") + 1) % 10).as("b"))
    val labels = Components.connectedComponents(edges.toDF(), "a", "b",
      maxLocalEdges = 0) // stress test pins the DISTRIBUTED path
    assert(labels.count() == 100000)
    val wrong = labels.filter(col("component") =!= col("id") - (col("id") % 10)).count()
    assert(wrong == 0, s"$wrong nodes got a wrong component")
  }

  test("connected components close a 1M-edge, 1M-diameter path (worst case for propagation)") {
    // A single path 0-1-2-…-1000000: the maximum-diameter graph on
    // 1M+1 nodes. Plain min propagation needs 1M rounds; path halving
    // must close it in ~log2(1M) ≈ 20 — inside the default maxIter=25.
    // This is the adversarial opposite of near-dup graphs (tiny
    // cliques) and the shape where an iterative operator without
    // lineage truncation or with a broken pointer jump falls over.
    val n = 1000000L
    val edges = spark.range(n).select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = Components.connectedComponents(edges.toDF(), "a", "b",
      maxLocalEdges = 0) // stress test pins the DISTRIBUTED path
    assert(labels.count() == n + 1)
    val wrong = labels.filter(col("component") =!= 0L).count()
    assert(wrong == 0, s"$wrong nodes failed to reach the path's min label")
  }

  test("as-of join over 1M events keeps exactly one match per left row") {
    // right rows at even times t=0,2,4,..., left rows at odd times;
    // backward match of left t is always right t-1... (t odd → t-1 even).
    val right = spark.range(500000).select(
      (col("id") % 1000).as("k"), expr("id div 1000 * 2").as("t"),
      col("id").as("rid"))
    val left = spark.range(500000).select(
      (col("id") % 1000).as("k"), expr("id div 1000 * 2 + 1").as("t"),
      col("id").as("lid"))
    val joined = AsOfJoin.backward(
      left.toDF(), right.toDF(), "k", "t", "t", "rid", "m_")
    assert(joined.count() == 500000)
    // every left row must match the right row at t-1 of the same key
    val bad = joined.filter(col("m_t") =!= col("t") - 1).count()
    assert(bad == 0, s"$bad rows matched the wrong as-of time")
  }

  test("pagerank on a 100k-node ring matches the closed-form fixed point") {
    // Directed ring i → (i+1) % n: perfectly symmetric, so every node's
    // rank is invariant under iteration: outdeg=1, incoming sum =
    // rank, and r' = 150000 + (r·85) div 100 converges per the exact
    // integer recurrence r_{t+1} = 150000 + floor(0.85·r_t) from
    // r_0 = 1e6: r_1 = 1000000, so EVERY iteration is a fixed point —
    // any deviation on any node means a join/aggregation bug at real
    // partition counts.
    val n = 100000L
    val edges = spark.range(n).select(
      col("id").as("src"), ((col("id") + 1) % n).as("dst"))
    val ranks = PageRank.run(edges.toDF(), iterations = 3,
      maxLocalEdges = 0) // stress test pins the DISTRIBUTED path
    assert(ranks.count() == n)
    val off = ranks.filter(col("rank") =!= 1000000L).count()
    assert(off == 0, s"$off ring nodes drifted from the fixed point")
  }

  test("shingle hashes over wide synthetic docs match the HOF tower at 200k rows") {
    import graft.functions.TextFunctions
    // Deterministic ~30-token docs with whitespace variety.
    val docs = spark.range(200000).select(
      concat_ws(" ", (0 until 30).map(i =>
        concat(lit("w"), ((col("id") + i * 37) % 211).cast("string"))): _*)
        .as("text"))
    val bad = docs.select(
      graft.expr.ShingleExpression.shingleHashes(col("text"), 3).as("fused"),
      sort_array(array_distinct(transform(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
        e => xxhash64(e)))).as("tower"))
      .filter(not(col("fused") === col("tower"))).count()
    assert(bad == 0)
  }

  test("weighted SSSP (forced distributed) on a 200k-edge weighted ring matches the closed form") {
    // ring of n nodes, edge i—(i+1)%n with weight (i%5)+1; from seed 0,
    // after k rounds dist(j) for j<=k is the prefix sum of weights
    // 0..j-1 (the one-directional geodesic — the other way is longer
    // than k hops for j <= k << n).
    val n = 200000L
    val edges = spark.range(n).select(
      col("id").as("u"), ((col("id") + 1) % n).as("v"),
      ((col("id") % 5) + 1).as("w"))
    val seeds = Seq(0L).toDF("n")
    val got = graft.operators.Bfs.weightedDistances(
        edges, "u", "v", "w", seeds, rounds = 6, maxLocalEdges = 0)
      .filter(col("node") <= 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // weights from node 0: 1,2,3,4,5,1 → prefix sums 0,1,3,6,10,15,16
    val want = Map(0L -> 0L, 1L -> 1L, 2L -> 3L, 3L -> 6L, 4L -> 10L, 5L -> 15L, 6L -> 16L)
    assert(got == want, s"got $got")
  }

  test("AQE splits a skewed join partition at runtime (the planner-side answer to q37's manual salting)") {
    // One hot key owns ~83% of the left side. With skew-join thresholds
    // scaled to the test data, AQE must mark the SMJ skew=true and split
    // the hot partition into multiple tasks — the runtime complement to
    // q37's explicit salting (which remains the portable fallback and
    // the right tool when the skew is known at write time).
    val keep = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keep.map { case (k, _) => k -> spark.conf.getOption(k) }
    keep.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(300000).select(
        when(col("id") < 250000, 0L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // collect() runs joined's OWN QueryExecution (count() would build
      // a fresh one, leaving this plan un-executed and never re-planned)
      assert(joined.collect().length == 300000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hierarchy rollup over 1M contiguous keys matches the closed-form depth profile") {
    // Contiguous keys 1..N make the decimal tree's profile pure
    // combinatorics: depth-d node count = #d-digit numbers ≤ N,
    // descendant slots = #keys with ≥ d digits = N - (10^(d-1) - 1),
    // and the max subtree at depth d ≤ 6 belongs to node 10^(d-1)
    // (repunit-sized prefix range, +1 for the 7-digit key 10^6).
    // cents = 1/row turns subtree sums into subtree sizes, so every
    // output cell is closed-form — at 7M exploded path rows the
    // single-shuffle path-enumeration claim is exercised for real.
    val dir = java.nio.file.Files.createTempDirectory("graft_tree1m_").toString
    spark.range(1, 1000001)
      .select(col("id").as("c_custkey"), lit(0.01).as("c_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = Queries.all("q331_hierarchy_rollup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 9L, 1000000L, 111112L, 1000000L),
      (2L, 90L, 999991L, 11112L, 999991L),
      (3L, 900L, 999901L, 1112L, 999901L),
      (4L, 9000L, 999001L, 112L, 999001L),
      (5L, 90000L, 990001L, 12L, 990001L),
      (6L, 900000L, 900001L, 2L, 900001L),
      (7L, 1L, 1L, 1L, 1L)),
      s"got ${rows.toSeq}")
  }
}
