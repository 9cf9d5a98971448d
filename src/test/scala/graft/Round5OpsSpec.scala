package graft

import org.apache.spark.sql.functions._

import graft.expr.JaroWinklerImpl
import graft.operators.PageRank

/** Construction-based ground truth for the round-3 batch-3 operators:
  * Jaro-Winkler semantics (q125) pinned to the classic record-linkage
  * fixture pairs (values verified against DuckDB's
  * `jaro_winkler_similarity`, the oracle engine), fixed-point PageRank
  * (q131) hand-iterated on tiny graphs, HLL sketch-merge accuracy
  * (q132, the rows-only query), and centroid-cosine (q127)
  * brute-force re-derivation.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("jaro-winkler matches the classic fixture pairs (DuckDB-verified values)") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // transposition + boost
      ("DIXON", "DICKSONX", 0.8133333333333332),  // prefix 2 boost
      ("DWAYNE", "DUANE", 0.8400000000000001),    // prefix 1 boost
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // J>0.7 but prefix 0
      ("CRATE", "TRACE", 0.7333333333333334),     // prefix 0 → jaro only
      ("abcxxxxx", "abcyyyyy", 0.5833333333333334), // J<=0.7 → NO boost
      ("abcdefghij", "abcdefghiX", 0.96),         // prefix capped at 4
      ("aaaaaa", "aa", 0.8222222222222222),
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),                          // window 0, no matches
      ("", "abc", 0.0),
      ("", "", 0.0),                              // both empty → 0, not 1
      ("MARTHA", "martha", 0.0))                  // case-sensitive
    for ((a, b, want) <- cases) {
      val got = JaroWinklerImpl.jaroWinkler(a, b)
      assert(math.abs(got - want) < 1e-12, s"jw($a, $b): got $got want $want")
      val sym = JaroWinklerImpl.jaroWinkler(b, a)
      assert(math.abs(sym - got) < 1e-12, s"jw must be symmetric for ($a, $b)")
    }
  }

  test("jaro-winkler codegen path (SQL function) agrees with the direct impl") {
    GraftExtensions.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("ab", "ba"),
      ("", ""), ("same", "same"))
      .toDF("a", "b")
      .selectExpr("a", "b", "graft_jaro_winkler(a, b) AS sim")
    for (r <- df.collect()) {
      val want = JaroWinklerImpl.jaroWinkler(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == want,
        s"codegen vs impl mismatch on (${r.getString(0)}, ${r.getString(1)})")
    }
    // Null propagation: BinaryExpression null handling → null out.
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS sim").collect()
    assert(n.head.isNullAt(0))
  }

  test("pagerank: hand-iterated 3-node graph, 2 rounds, exact fixed-point values") {
    // a→b, a→c, b→c, c→a. outdeg: a=2, b=1, c=1.
    // r1: a=150000+850000, b=150000+425000, c=150000+(1500000*85)div100
    // r2: a=150000+(1425000*85)div100=1361250, b=575000, c=1063750.
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val got = PageRank.run(edges, iterations = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1361250L, "b" -> 575000L, "c" -> 1063750L))
  }

  test("pagerank: dangling node leaks mass but keeps receiving, and iterations=0 is the init") {
    val edges = Seq(("a", "d")).toDF("src", "dst")
    val r0 = PageRank.run(edges, iterations = 0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r0 == Map("a" -> 1000000L, "d" -> 1000000L))
    val r2 = PageRank.run(edges, iterations = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // r1: a=150000 (no in-edges), d=150000+850000=1000000
    // r2: d gets a's r1 mass: 150000+(150000*85)div100=277500; a stays base.
    assert(r2 == Map("a" -> 150000L, "d" -> 277500L))
  }

  test("q132 hll estimates land within 5% of exact, per event type") {
    // q132 now carries the contracts as judged tolerance FLAGS next to
    // the exact bitmap counts (oracle pins the flags true); assert the
    // flags and the exact column against countDistinct here.
    val rows = Queries.q132_hll_merge(spark, sf("sf0.01")).collect()
    assert(rows.length == 5)
    val exact = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getAs[Long]("exact_users") == exact(r.getString(0)),
        s"${r.getString(0)} exact bitmap count drifted")
      assert(r.getAs[Boolean]("apx_ok"),
        s"${r.getString(0)}: estimate outside the 5% contract")
      assert(r.getAs[Boolean]("merge_ok"),
        s"${r.getString(0)}: merged vs direct sketch outside 2%")
    }
  }

  test("hll merge-of-partials tracks the single-pass sketch (mergeability)") {
    val ev = sources.Tables.events(spark, sf("sf0.01"))
    val merged = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0).toDouble
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getLong(0).toDouble
    assert(math.abs(merged - direct) / direct < 0.02,
      s"merged $merged vs direct $direct drifted >2%")
  }

  test("fused shingle-hash expression == the composable 4-HOF tower, whole corpus") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val both = docs.select(
      graft.expr.ShingleExpression.shingleHashes(col("text"), 3).as("fused"),
      sort_array(array_distinct(transform(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
        e => xxhash64(e)))).as("tower"))
    assert(both.filter(not(col("fused") === col("tower"))).count() == 0)
    // Edge cases: empty, whitespace-only, fewer tokens than n, dups.
    val edge = Seq("", "   \t\n ", "one two", "a b a b a b", "A  B\tC")
      .toDF("text")
      .select(
        graft.expr.ShingleExpression.shingleHashes(col("text"), 3).as("fused"),
        sort_array(array_distinct(transform(
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
          e => xxhash64(e)))).as("tower"))
    assert(edge.filter(not(col("fused") === col("tower"))).count() == 0)
  }

  test("minhash-from-hashes == minhash-from-strings across the corpus") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val both = docs.select(
      graft.expr.MinHashExpression.minhashHashed(
        graft.expr.ShingleExpression.shingleHashes(col("text"), 3), 32).as("fused"),
      TextFunctions.minhashSignature(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3), 32)
        .as("stringly"))
    assert(both.filter(not(col("fused") === col("stringly"))).count() == 0)
  }

  test("heavy hitters with an integral key column probes the sketch through the long path") {
    // user_id is BIGINT: the sketch is built via addLong, so a
    // stringified probe would estimate ~0 and silently drop every true
    // heavy key — this pins the typed probe to GROUP BY HAVING.
    val ev = sources.Tables.events(spark, sf("sf0.01"))
    val got = operators.HeavyHitters.atLeast(ev, "user_id", threshold = 25L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 25).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty, "fixture must contain heavy keys for the test to bite")
    assert(got == want)
  }

  test("q134 bitmap popcounts equal countDistinct exactly, per type and overall") {
    val got = Queries.q134_bitmap_distinct(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = sources.Tables.events(spark, sf("sf0.01"))
    val want = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("(all)" -> ev.select(countDistinct("user_id")).collect().head.getLong(0))
    assert(got == want)
  }

  test("q138 decile lift: shares are monotone, end at exactly 10000 bp, cover all customers") {
    val rows = Queries.q138_decile_lift(spark, sf("sf0.01")).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    // Cumulation runs top-decile-down, so share DECREASES with decile
    // number and decile 1's cumulative share covers everything.
    val shares = rows.map(_.getLong(3))
    assert(shares.head == 10000L, s"decile 1 must close at 10000 bp, got ${shares.head}")
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    val nCust = spark.read.parquet(s"${sf("sf0.01")}/orders.parquet")
      .select(countDistinct("o_custkey")).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("q139 islands: dropping every 7th id leaves runs of exactly six (plus edge runs)") {
    val rows = Queries.q139_gap_islands(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = rows.map { case (len, n) => len * n }.sum
    val want = sources.Tables.events(spark, sf("sf0.001"))
      .filter(col("event_id") % 7 =!= 0).count()
    assert(total == want, "island lengths must partition the surviving ids")
    // Interior islands are the 6 ids between consecutive multiples of 7.
    assert(rows.keySet.contains(6L) && rows(6L) >= rows.values.max - 1)
  }

  test("q135 funnel lag: every cohort satisfies p50 <= p90 <= max and counts converters") {
    val rows = Queries.q135_funnel_lag(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        s"cohort ${r.getLong(0)}: quantiles out of order")
    }
  }

  test("q127 centroid cosine: brute-force re-derivation for the first pair") {
    val out = Queries.q127_centroid_sim(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty && out.forall(r =>
      r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
    val (la, lb) = (out.head.getInt(0), out.head.getInt(1))
    val cents = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .filter(col("label").isin(la, lb))
      .select(col("label"), col("embedding"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        val vecs = rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
        val dim = vecs.head.length
        l -> Array.tabulate(dim)(i => vecs.map(_(i)).sum / vecs.length)
      }
    val (ca, cb) = (cents(la), cents(lb))
    val dot = ca.zip(cb).map { case (x, y) => x * y }.sum
    val want = dot / (math.sqrt(ca.map(x => x * x).sum) *
      math.sqrt(cb.map(x => x * x).sum))
    assert(math.abs(out.head.getDouble(2) - want) < 1e-3,
      s"centroid cosine ${out.head.getDouble(2)} vs brute force $want")
  }
}
