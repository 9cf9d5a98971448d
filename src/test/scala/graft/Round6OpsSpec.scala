package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, LabelProp, LocalGraph, Pca, SemanticDedup}

/** Construction-based ground truth for the round-5 additions: label
  * propagation (q166) hand-iterated on a bridged-cliques graph and
  * pinned local==distributed, semantic dedup (q167) against planted
  * duplicates and a single-cell brute-force differential, PCA power
  * iteration (q168) against a planted dominant axis, and the
  * bloom-pruned join (q169) against the plain join it must equal.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // Two triangles {1,2,3} and {10,11,12} joined by one bridge 3—10:
  // labels flood each triangle to its min (1 resp. 10) but the bridge
  // carries only ONE vote, so the communities stay distinct at any
  // round count — exactly what separates LPA from connected
  // components (which would merge everything into label 1).
  private val bridgedCliques = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),
    (10L, 11L), (10L, 12L), (11L, 12L),
    (3L, 10L))

  test("label propagation: bridged cliques keep distinct labels; CC would merge them") {
    val edges = bridgedCliques.toDF("u", "v")
    val got = LabelProp.run(edges, "u", "v", rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Hand-iterated fixpoint (reached at round 3): the min-label
    // tie-break leaks the bridge endpoint's label (3) ACROSS the
    // bridge — node 10's first-round plurality tie resolves to 3, and
    // 3 then floods clique B — but the PARTITION stays two distinct
    // communities, which is the property separating LPA from
    // connected components (one component, label 1, everywhere).
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
    assert(got.values.toSet.size == 2, "two communities must survive")
  }

  test("label propagation: round-0 is the identity labeling, round-1 is the hand-computed plurality") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v") // path 1—2—3
    val r0 = LabelProp.run(edges, "u", "v", rounds = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // r1: node 1 sees {2}→2; node 2 sees {1,3}, tie → min 1; node 3 sees {2}→2.
    val r1 = LabelProp.run(edges, "u", "v", rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("label propagation: distributed path (gate forced shut) matches the local solver") {
    val edges = bridgedCliques.toDF("u", "v")
    val dist = LabelProp.run(edges, "u", "v", rounds = 3, maxLocalEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val local = LocalGraph.labelProp(bridgedCliques.toArray, rounds = 3)
    assert(dist.toSeq == local.toSeq)
  }

  // Deterministic synthetic embedding corpus: two orthogonal cluster
  // directions with per-id jitter in a third dimension, plus planted
  // EXACT duplicate pairs (cosine 1 >= any tau).
  private def plantedCorpus() = {
    val base = (0L until 40L).map { i =>
      val axis = if (i % 2 == 0) Array(1.0, 0.0, 0.1 * (i % 5)) else Array(0.0, 1.0, 0.1 * (i % 5))
      (i, axis.toSeq)
    }
    val dups = Seq(
      (100L, base(0)._2),  // duplicate of id 0
      (101L, base(1)._2))  // duplicate of id 1
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("semantic dedup: planted exact duplicates are dropped (higher id of each pair)") {
    val df = plantedCorpus()
    val drops = SemanticDedup.drops(df, "vec_id", "embedding",
      nCentroids = 2, tau = 0.999).select("drop_id").collect().map(_.getLong(0)).toSet
    assert(drops.contains(100L) && drops.contains(101L),
      s"planted duplicates must be dropped, got $drops")
    assert(!drops.contains(0L) && !drops.contains(1L),
      "the LOWER id of each pair is the kept representative")
  }

  test("semantic dedup: single cell == brute-force all-pairs at the same tau") {
    val df = plantedCorpus()
    val tau = 0.95
    // nCentroids=1 puts every vector in one cell → cluster scoping
    // vanishes and the operator must equal the exact all-pairs rule.
    val got = SemanticDedup.drops(df, "vec_id", "embedding", nCentroids = 1, tau = tau)
      .select("drop_id").collect().map(_.getLong(0)).toSet
    val normed = graft.operators.AnnIvf.normalized(df, "vec_id", "embedding")
    val right = normed.select(col("id").as("id2"), col("nv").as("nv2"))
    val want = normed.crossJoin(right)
      .filter(col("id") < col("id2"))
      .filter(graft.expr.VectorExpressions.dot(col("nv"), col("nv2")) >= tau)
      .select("id2").collect().map(_.getLong(0)).toSet
    assert(got == want, s"single-cell drops $got != brute force $want")
  }

  test("pca: power iteration recovers a planted dominant axis") {
    // Spread 10x larger along u = (3,4)/5 than along its orthogonal.
    val u = Array(0.6, 0.8)
    val w = Array(-0.8, 0.6)
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 10.0        // dominant coordinate, sd ~5.8
      val s = ((i * 7) % 11 - 5) / 10.0 // minor coordinate, sd ~0.3
      (i.toLong, Seq(t * u(0) + s * w(0), t * u(1) + s * w(1)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Pca.topEigenvector(Pca.covarianceMatrix(df, "vec_id", "embedding", 2))
    val cos = math.abs(v(0) * u(0) + v(1) * u(1))
    assert(cos > 0.999, s"eigenvector ${v.toSeq} should align with planted axis, |cos|=$cos")
  }

  test("pca: projection histogram covers the corpus and bins are ordered") {
    val df = sources.Tables.read(spark, sf("sf0.001"), "embeddings")
    val hist = Queries.q168_pca_power(spark, sf("sf0.001")).collect()
    assert(hist.map(_.getLong(1)).sum == df.count(), "every vector lands in exactly one bin")
    val bins = hist.map(_.getLong(0))
    assert(bins.toSeq == bins.sorted.toSeq && bins.distinct.length == bins.length)
    val lows = hist.map(_.getDouble(2))
    assert(lows.toSeq == lows.sorted.toSeq, "bin lower bounds must ascend")
  }

  test("bloom-pruned join equals the plain join for any fpp (false positives removed exactly)") {
    val li = sources.Tables.read(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val urgent = sources.Tables.read(spark, sf("sf0.001"), "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    for (fpp <- Seq(0.5, 0.01)) { // a terrible bloom must still be exact
      val got = BloomJoin.prunedJoin(li, "l_orderkey", urgent, "o_orderkey",
        expectedItems = 10000L, fpp = fpp)
        .agg(count(lit(1)), round(sum("l_extendedprice"), 2)).collect().head
      val want = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)), round(sum("l_extendedprice"), 2)).collect().head
      assert(got == want, s"fpp=$fpp: bloom-pruned join diverged from plain join")
    }
  }

  test("bloom-pruned join drops null probe keys (SQL equality semantics)") {
    val big = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("k")
    val small = Seq(1L, 2L).toDF("k2")
    val got = BloomJoin.prunedJoin(big, "k", small, "k2", expectedItems = 100L)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("containment join: embedded quote scores 1.0 toward its host, host stays below threshold") {
    import graft.operators.SetSimJoin
    val quote = "alpha beta gamma delta epsilon"
    val host = s"intro words before the excerpt $quote and a long tail of unrelated prose " +
      "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((1L, quote), (2L, host), (3L, "entirely different content here today"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val got = SetSimJoin.containmentJoin(docs, "doc_id", "toks",
      shingleSize = 3, maxDf = 50L, minContainment = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // Every 3-shingle of the quote occurs verbatim in the host → 1.0;
    // the host's containment in the quote is tiny; doc 3 matches nothing.
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("containment join: shingles over the df cap can neither create nor dilute a match") {
    import graft.operators.SetSimJoin
    // "common common common" appears in every doc; with maxDf below
    // the corpus size it is excluded from numerator AND denominator,
    // so docs sharing ONLY boilerplate never pair.
    val docs = (1L to 10L).map(i => (i, s"common common common unique$i word$i tail$i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val got = SetSimJoin.containmentJoin(docs, "doc_id", "toks",
      shingleSize = 3, maxDf = 5L, minContainment = 0.1)
    assert(got.count() == 0L, "boilerplate-only overlap must not pair documents")
  }

  test("zipf fit: an exact power-law corpus recovers its planted slope") {
    // freq(rank r) = round(1000 * r^-0.8): regressing ln(freq) on
    // ln(rank) must recover ~-0.8 (rounding of small counts bends the
    // tail slightly; 30 ranks keeps counts >= 66 where rounding is
    // sub-1%).
    val words = (1 to 30).flatMap { r =>
      val c = math.round(1000.0 * math.pow(r.toDouble, -0.8)).toInt
      Seq.fill(c)(s"w$r")
    }
    val counts = words.toDF("w").groupBy("w").agg(count(lit(1)).as("c"))
    val ranked = graft.operators.PrefixSum.globalRank(
      counts.select(col("w"), col("c"), (-col("c")).as("negc")), Seq("negc", "w"), "r")
    val slope = ranked
      .agg(regr_slope(log(col("c")), log(col("r"))).as("s"))
      .collect().head.getDouble(0)
    assert(math.abs(slope - (-0.8)) < 0.01, s"planted slope -0.8, got $slope")
  }

  test("compression ratio: repetitive text compresses below prose, and edge cases hold") {
    import graft.functions.CompressionScore
    val df = Seq(
      (1L, "spam " * 400),
      (2L, "the quick brown fox jumps over the lazy dog while seventeen " +
        "violinists argue about parquet footers and shuffle partitions in " +
        "a crowded amsterdam cafe during an unseasonably warm october evening"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), CompressionScore.ratio(col("text")).as("r"))
    val rows = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).get < 0.1, s"400x-repeated token must compress hard, got ${rows(1L)}")
    assert(rows(2L).get > rows(1L).get + 0.3, "prose must compress far worse than spam")
    assert(rows(3L).contains(1.0) && rows(4L).isEmpty)
    // Determinism: a second evaluation yields identical doubles.
    val again = Seq((1L, "spam " * 400)).toDF("id", "text")
      .select(CompressionScore.ratio(col("text"))).collect().head.getDouble(0)
    assert(again == rows(1L).get)
  }
}
