package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, PrefixSum}

/** Construction-based ground truth for the graph/scan operators:
  * connected components (q53) and the distributed prefix sum (q42/q55).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques, and isolated pairs collapse to min id") {
    // 1-2-3-4 chain, {10,11,12} triangle, {20,21} pair
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("connected components: pointer jumping closes a 30-node path in O(log d) rounds") {
    // plain min propagation would need ~30 rounds; path halving must
    // land well inside 8 (observed: 5)
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b", maxIter = 8,
        maxLocalEdges = 0) // force the distributed path: this test pins pointer jumping
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 30 && got.values.forall(_ == 0L))
  }

  test("connected components: non-strict mode returns partial labels past maxIter") {
    // A 30-node path cannot converge in 1 round; strict=false must
    // return the partial labels instead of aborting, and those labels
    // are a monotone upper bound: every node's label is a node id of
    // the SAME component (here all one component), never below the
    // true min (0), and re-running CC on the induced (id→label) edges
    // would converge — the documented "iterate again" contract.
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    // maxLocalEdges = 0 throughout: the local solver always converges,
    // so partial-result semantics only exist on the distributed path
    intercept[IllegalArgumentException] {
      Components.connectedComponents(edges, "a", "b", maxIter = 1, maxLocalEdges = 0)
    }
    val partial = Components.connectedComponents(edges, "a", "b",
        maxIter = 1, strict = false, maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial.size == 30)
    assert(partial.forall { case (id, label) => label >= 0L && label <= id },
      "labels are node ids, monotone toward the component min")
    assert(partial.exists { case (id, label) => label != 0L && id != 0L },
      "1 round must NOT have fully converged on a 30-node path (else the test is vacuous)")
    // One more pass over the label graph reaches the true fixpoint.
    val again = Components.connectedComponents(
      edges.select(col("a"), col("b"))
        .union(partial.toSeq.toDF("a", "b")), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again.values.forall(_ == 0L))
  }

  test("connected components match a BFS ground truth on a random graph (seeded)") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = (0 until 150).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inEdges = edges.flatMap { case (a, b) => Seq(a.toInt, b.toInt) }.toSet
    val want = inEdges.map(i => i.toLong ->
      // component = min node id in the component, restricted to nodes with edges
      inEdges.filter(j => find(j) == find(i)).min.toLong).toMap
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("distributed prefix sum equals the single-partition global window") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("cum", sum("v").over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = PrefixSum.runningTotal(df, "id", "v", "cum",
        numPartitions = 7, smallInputBytes = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("prefix sum is partition-count invariant") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
    val one = PrefixSum.runningTotal(df, "id", "v", "cum",
        numPartitions = 1, smallInputBytes = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val many = PrefixSum.runningTotal(df, "id", "v", "cum",
        numPartitions = 16, smallInputBytes = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one == many)
  }

  test("prefix sum small-input path equals the distributed path") {
    val df = (0 until 500).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val small = PrefixSum.runningTotal(df, "id", "v", "cum") // under threshold
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dist = PrefixSum.runningTotal(df, "id", "v", "cum", smallInputBytes = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(small == dist)
  }

  test("prefix-sum distributed plan has no un-partitioned window") {
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "v")
    val plan = PrefixSum.runningTotal(df, "id", "v", "cum", smallInputBytes = 0)
      .queryExecution.executedPlan
    val globalWins = planNodes(plan).count {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.isEmpty
      case _ => false
    }
    assert(globalWins == 0, "prefix sum must not plan a single-partition window")
  }

  private def censusOf(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
    val r = graft.operators.Triangles.census(edges.toDF("a", "b"), "a", "b")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("triangle census: K4, shared-edge pair, path, star") {
    // K4: 4 triangles, wedges sum C(3,2)=12, coeff 1.0 — edges fed
    // unordered/duplicated to prove canonicalization
    assert(censusOf(Seq((2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L), (2L, 4L), (4L, 3L), (1L, 2L)))
      == ((4L, 12L, 4L, 6L, 1.0)))
    // two triangles sharing edge 2-3: degrees (2,3,3,2) -> wedges 8
    assert(censusOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == ((2L, 8L, 4L, 5L, 0.75)))
    // 5-node path: all wedges open
    assert(censusOf((0L until 4L).map(i => (i, i + 1)))
      == ((0L, 3L, 5L, 4L, 0.0)))
    // star hub: the degree orientation points every edge AT the hub,
    // so the hub enumerates zero wedges (the d^2 blow-up the naive
    // neighbor-pair join would pay)
    assert(censusOf((1L to 20L).map(i => (0L, i)))
      == ((0L, 190L, 21L, 20L, 0.0)))
  }

  test("triangle census matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (for (u <- 0L until 40L; v <- (u + 1) until 40L
                      if rnd.nextDouble() < 0.15) yield (u, v)).toSeq
    val adj = edges.toSet
    var brute = 0L
    for (u <- 0L until 40L; v <- (u + 1) until 40L; w <- (v + 1) until 40L)
      if (adj((u, v)) && adj((v, w)) && adj((u, w))) brute += 1
    val (tri, _, _, nEdges, _) = censusOf(edges)
    assert(tri == brute && nEdges == edges.size,
      s"census $tri vs brute $brute over ${edges.size} edges")
    // the shuffle-close path (edge list beyond broadcast range at real
    // scale) must count identically to the broadcast-close default
    val shuffled = graft.operators.Triangles
      .census(edges.toDF("a", "b"), "a", "b", broadcastGraph = false)
      .collect().head
    assert(shuffled.getLong(0) == brute && shuffled.getLong(3) == edges.size,
      s"shuffle-close census ${shuffled.getLong(0)} vs brute $brute")
  }

  test("staged-adjacency census and perNode match the direct-edge path") {
    val rnd = new scala.util.Random(13)
    val edges = (for (u <- 0L until 40L; v <- (u + 1) until 40L
                      if rnd.nextDouble() < 0.2) yield (u, v)).toSeq
    val ef = edges.toDF("a", "b")
    // adjacency() output round-trips through parquet in the staged
    // path; exercise the same write/read to pin schema + array types.
    val dir = java.nio.file.Files.createTempDirectory("adjspec_").toString
    graft.operators.Triangles.adjacency(ef, "a", "b")
      .write.mode("overwrite").parquet(dir)
    val adj = spark.read.parquet(dir)
    val directC = graft.operators.Triangles.census(ef, "a", "b")
      .collect().head.toSeq
    val stagedC = graft.operators.Triangles.censusFromAdjacency(adj)
      .collect().head.toSeq
    assert(stagedC == directC, s"census staged $stagedC vs direct $directC")
    def key(r: org.apache.spark.sql.Row) = r.getLong(0)
    val directP = graft.operators.Triangles.perNode(ef, "a", "b", minDeg = 2)
      .collect().map(r => key(r) -> r.toSeq).toMap
    val stagedP = graft.operators.Triangles.perNodeFromAdjacency(adj, minDeg = 2)
      .collect().map(r => key(r) -> r.toSeq).toMap
    assert(stagedP == directP, "perNode staged path diverges from direct path")
    graft.CacheRegistry.releaseAll()
  }

  private def coreOf(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    graft.operators.KCore.kCore(edges.toDF("a", "b"), "a", "b", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("k-core: K4 with a pendant path, star, two triangles") {
    // K4 on 1-4 plus path 4-5-6: the path peels in two rounds; the
    // 2-core AND 3-core are both exactly K4 (induced degree 3)
    val k4tail = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    assert(coreOf(k4tail, 2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(coreOf(k4tail, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(coreOf(k4tail, 4) == Map.empty)
    // star: every leaf has degree 1 → 2-core empty (hub peels after leaves)
    assert(coreOf((1L to 10L).map(i => (0L, i)), 2) == Map.empty)
    // two triangles sharing node 3: 2-core keeps everything
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    assert(coreOf(twoTri, 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 4L, 4L -> 2L, 5L -> 2L))
  }

  test("k-core matches brute-force peeling on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (for (u <- 0L until 60L; v <- (u + 1) until 60L
                      if rnd.nextDouble() < 0.08) yield (u, v)).toSeq
    for (k <- Seq(2, 3, 4)) {
      var adj = edges.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
      var done = false
      while (!done) {
        val drop = adj.collect { case (n, vs) if vs.size < k => n }.toSet
        if (drop.isEmpty) done = true
        else adj = adj.collect {
          case (n, vs) if !drop(n) => n -> (vs -- drop)
        }.filter(_._2.nonEmpty)
      }
      val expect = adj.map { case (n, vs) => n -> vs.size.toLong }
      assert(coreOf(edges, k) == expect, s"k=$k core mismatch")
    }
  }

  test("cost-based local fallback equals the distributed path (CC, k-core, PageRank, BFS)") {
    // The LocalGraph gate must be INVISIBLE: same seeded random graph,
    // maxLocalEdges=0 (forced distributed) vs default (local here) —
    // bit-identical outputs for all four operators. This is the
    // contract that lets the fallback run under the DuckDB oracles.
    val rnd = new scala.util.Random(23)
    val edges = (for (u <- 0L until 80L; v <- (u + 1) until 80L
                      if rnd.nextDouble() < 0.05) yield (u, v)).toSeq
    val df = edges.toDF("a", "b")
    def rows(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.collect().map(_.toString).toSet

    val ccD = Components.connectedComponents(df, "a", "b", maxLocalEdges = 0)
    val ccL = Components.connectedComponents(df, "a", "b")
    assert(rows(ccD) == rows(ccL), "CC local != distributed")

    val kcD = graft.operators.KCore.kCore(df, "a", "b", k = 2, maxLocalEdges = 0)
    val kcL = graft.operators.KCore.kCore(df, "a", "b", k = 2)
    assert(rows(kcD) == rows(kcL), "k-core local != distributed")

    val dir = df.select(col("a").as("src"), col("b").as("dst"))
      .union(df.select(col("b").as("src"), col("a").as("dst")))
    val prD = graft.operators.PageRank.run(dir, iterations = 3, maxLocalEdges = 0)
    val prL = graft.operators.PageRank.run(dir, iterations = 3)
    assert(rows(prD) == rows(prL), "pagerank local != distributed")

    // Personalized form: same parity contract, and mass must stay
    // concentrated around the seed (seed outranks every node, nodes
    // never touched by 3 hops sit at exactly 0).
    val pprSeed = Seq(0L).toDF("node")
    val pprD = graft.operators.PageRank.run(dir, iterations = 3,
      maxLocalEdges = 0, teleportSeeds = Some(pprSeed))
    val pprL = graft.operators.PageRank.run(dir, iterations = 3,
      teleportSeeds = Some(pprSeed))
    assert(rows(pprD) == rows(pprL), "personalized pagerank local != distributed")
    val pprMap = pprL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pprMap(0L) == pprMap.values.max, "seed must hold the max PPR mass")
    assert(pprMap.values.exists(_ == 0L), "unreached nodes must sit at exactly 0")

    val seeds = Seq(0L, 17L, 40L).toDF("node")
    val bfD = graft.operators.Bfs.hops(df, "a", "b", seeds, maxRounds = 12,
      maxLocalEdges = 0)
    val bfL = graft.operators.Bfs.hops(df, "a", "b", seeds, maxRounds = 12)
    assert(rows(bfD) == rows(bfL), "bfs local != distributed")
    // sanity: seeds settle at 0, everything else strictly positive
    val m = bfL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == 0L && m(17L) == 0L && m(40L) == 0L)
    assert(m.count(_._2 > 0L) > 0)
  }
}
