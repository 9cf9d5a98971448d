package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Construction-based ground truth for the q194-q200 additions:
  * winnowing's shared-run detection guarantee, the blocking contract of
  * the fuzzy linkage, the sequential-funnel ordering semantics, the
  * day-grain cohort arithmetic, a hand-computed Adamic-Adar graph, the
  * BPE encoder's greedy semantics and distributed==local differential,
  * and one crafted document per Gopher rule.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- q194 winnowing -------------------------------------------------

  /** documents.parquet with the q194-required columns only. */
  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

  test("winnowing: a shared 30-token passage yields a pair; disjoint docs never do") {
    val dir = tmp("graft_winnow_")
    val passage = (1 to 30).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $passage eta theta iota kappa"),
      (2L, s"one two three four five six seven $passage eight nine ten eleven"),
      // doc 3: entirely distinct vocabulary, same length shape
      (3L, (1 to 40).map(i => s"only$i").mkString(" ")))
    writeDocs(dir, docs)
    val got = Queries.all("q194_winnowing")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 1 && got(0)._1 == 1L && got(0)._2 == 2L,
      s"exactly the planted pair must surface, got ${got.toSeq}")
    // The winnowing guarantee: a shared run of w+k-1 = 11 tokens keeps
    // at least one common fingerprint; 30 shared tokens comfortably
    // clear the shared >= 3 reporting threshold.
    assert(got(0)._3 >= 3)
  }

  test("winnowing: fingerprint set is strictly smaller than the gram set on real docs") {
    // Reimplement the two stages on the real corpus and compare sizes:
    // the ~2/(w+1) density is the point of winnowing vs a full-gram
    // index (q194's scaladoc claim, measured here).
    val ws = graft.functions.TextFunctions.tokens(col("text"))
    val grams = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), ws.as("ws")).filter(size(col("ws")) >= 4)
      .select(col("doc_id"), transform(sequence(lit(1), size(col("ws")) - 3),
        i => md5(concat_ws(" ", slice(col("ws"), i, lit(4))))).as("hs"))
    val nGrams = grams.select(explode(col("hs"))).distinct().count()
    val nFps = grams.select(explode(when(size(col("hs")) >= 8,
        transform(sequence(lit(1), size(col("hs")) - 7),
          i => array_min(slice(col("hs"), i, lit(8)))))
        .otherwise(array(array_min(col("hs"))))).as("fp")).distinct().count()
    assert(nFps * 2 < nGrams, s"winnowing must compress: $nFps fps vs $nGrams grams")
  }

  // ---- q195 fuzzy linkage ---------------------------------------------

  test("fuzzy linkage: within-block near-names pair; cross-block near-names do not (the blocking contract)") {
    val dir = tmp("graft_fuzzy_")
    Seq("red bolt", "ted bolt", "red ring", "red rings xx")
      .toDF("p_name").write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Queries.all("q195_fuzzy_linkage")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // "red bolt"/"ted bolt": block 'bolt', distance 1 → pair.
    // "red bolt"/"red ring": distance 3 but DIFFERENT blocks → absent;
    // blocking trades that recall for never scoring cross-block pairs.
    assert(got == Set(("red bolt", "ted bolt", 1L)), s"got $got")
  }

  // ---- q196 funnel / q197 cohort --------------------------------------

  private def writeEvents(dir: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("funnel: stages chain off the previous stage's timestamp; out-of-order and late events don't count") {
    val dir = tmp("graft_funnel_")
    writeEvents(dir, Seq(
      // user 1: view → click (+2h) → purchase (+2h after click): all 3 stages
      (1L, ts("2024-01-01 08:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      // user 2: click BEFORE the first view, purchase 20h after view:
      // only stage 1 (the pre-view click can't satisfy stage 2; no
      // stage-2 click ⇒ stage 3 unreachable even though a purchase exists)
      (4L, ts("2024-01-02 07:00:00"), 2L, "click"),
      (5L, ts("2024-01-02 08:00:00"), 2L, "view"),
      (6L, ts("2024-01-03 04:00:00"), 2L, "purchase"),
      // user 3: no view at all: in no stage
      (7L, ts("2024-01-04 09:00:00"), 3L, "click")))
    val got = Queries.all("q196_funnel")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 2L), (2, 1L), (3, 1L)), s"got ${got.toSeq}")
  }

  test("cohort retention: hand-computed day-grain matrix with the ratio denominator = cohort size") {
    val dir = tmp("graft_cohort_")
    writeEvents(dir, Seq(
      // cohort 2024-01-01: users 1,2 (first events that day)
      (1L, ts("2024-01-01 09:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 09:30:00"), 2L, "view"),
      // user 1 purchases day 0 and day 2; user 2 purchases day 2 only
      (3L, ts("2024-01-01 10:00:00"), 1L, "purchase"),
      (4L, ts("2024-01-03 10:00:00"), 1L, "purchase"),
      (5L, ts("2024-01-03 11:00:00"), 2L, "purchase"),
      // cohort 2024-01-05: user 3, purchases day 9 (outside 0..7 → absent)
      (6L, ts("2024-01-05 09:00:00"), 3L, "view"),
      (7L, ts("2024-01-14 09:00:00"), 3L, "purchase")))
    val got = Queries.all("q197_cohort_retention")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 1L, 0.5),
      ("2024-01-01", 2L, 2L, 1.0)), s"got ${got.toSeq}")
  }

  // ---- q198 Adamic-Adar -----------------------------------------------

  test("adamic-adar: hand-computed score on a 3-node path graph") {
    val dir = tmp("graft_aa_")
    // Orders: {1,2} twice, {2,3} twice → edges 1—2, 2—3 (co >= 2);
    // orders {1,4} once → no edge (below the co>=2 floor).
    Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L),
        (102L, 2L), (102L, 3L), (103L, 2L), (103L, 3L),
        (104L, 1L), (104L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.all("q198_adamic_adar")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // Only non-adjacent pair with a common neighbor: (1,3) through z=2.
    // deg(2) = 2 → AA = 1/ln 2 = 1.4427 (4 dp).
    assert(got.toSeq == Seq((1L, 3L, 1L, 1.4427)), s"got ${got.toSeq}")
  }

  // ---- q199 BPE encode ------------------------------------------------

  test("bpe encode: greedy left-to-right semantics on the hand example") {
    val m1 = Seq(Bpe.Merge(1, "a", "a", 0L))
    assert(Bpe.encodeLocal("aaaa", m1) == Vector("aa", "aa"))
    assert(Bpe.encodeLocal("aaaaa", m1) == Vector("aa", "aa", "a"))
    val m2 = m1 :+ Bpe.Merge(2, "aa", "aa", 0L)
    assert(Bpe.encodeLocal("aaaa", m2) == Vector("aaaa"))
    // Merges apply in learned order: (a,b) then (ab,c) composes "abc".
    val m3 = Seq(Bpe.Merge(1, "a", "b", 0L), Bpe.Merge(2, "ab", "c", 0L))
    assert(Bpe.encodeLocal("abcabc", m3) == Vector("abc", "abc"))
  }

  test("bpe encode: distributed == driver-local for every corpus word, incl. 1-char words") {
    val words = Map("lowest" -> 5L, "newest" -> 6L, "widest" -> 3L,
      "low" -> 7L, "new" -> 2L, "a" -> 9L)
    val df = words.toSeq.toDF("word", "n")
    val merges = Bpe.learnMerges(df, k = 4)
    assert(merges.nonEmpty)
    val got = Bpe.encode(df, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    for ((w, _) <- words)
      assert(got(w) == Bpe.encodeLocal(w, merges),
        s"word $w: ${got(w)} != ${Bpe.encodeLocal(w, merges)}")
  }

  // ---- q200 Gopher rules ----------------------------------------------

  test("gopher rules: each rule fires on its crafted doc and only there; a clean doc passes") {
    val dir = tmp("graft_gopher_")
    // NOTE words must stay short (sum_len <= 5·n) except in doc 3 —
    // "word10".length = 6 would trip the mean-word-length rule.
    val clean = ((1 to 50).map(i => s"w$i") ++ Seq("the", "a")).mkString(" ")
    val docs = Seq(
      (1L, clean), // passes all four rules → absent from output
      (2L, "the a short doc " + (1 to 10).map(i => s"w$i").mkString(" ")), // < 30 words
      (3L, ((1 to 50).map(i => s"verylongword$i") ++ Seq("the", "a")).mkString(" ")), // mean len > 5
      (4L, (1 to 50).map(i => s"w$i").mkString(" ")), // no stopwords
      (5L, (Seq.fill(15)("dominant") ++ (1 to 35).map(i => s"w$i") ++ Seq("the", "a")).mkString(" ")))
    writeDocs(dir, docs)
    val got = Queries.all("q200_gopher_rules")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(!got.contains(1L), s"clean doc must pass, got $got")
    assert(got(2L) == "short")
    assert(got(3L) == "mean_word_len")
    assert(got(4L) == "no_stopwords")
    assert(got(5L) == "top_word_dom")
  }

  // ---- q201 HITS ------------------------------------------------------

  test("hits: hand-computed bipartite rounds on a 2-customer, 3-part graph") {
    val dir = tmp("graft_hits_")
    // customer 1 buys parts {10, 11}; customer 2 buys {11, 12}.
    Seq((100L, 1L), (101L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((100L, 10L), (100L, 11L), (101L, 11L), (101L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.all("q201_hits")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a1 = in-degree: p10=1, p11=2, p12=1.
    // h1: c1 = a1(10)+a1(11) = 3; c2 = a1(11)+a1(12) = 3.
    // a2: p10 = 3, p11 = 6, p12 = 3.  h2: c1 = 9, c2 = 9.
    val auth = got.filter(_._1 == "authority").map(r => r._2 -> r._3).toMap
    val hub = got.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    assert(auth == Map(10L -> 3L, 11L -> 6L, 12L -> 3L), s"got $auth")
    assert(hub == Map(1L -> 9L, 2L -> 9L), s"got $hub")
  }

  // ---- q202 association rules -----------------------------------------

  test("assoc rules: hand-computed confidence and lift on crafted baskets") {
    val dir = tmp("graft_assoc_")
    // 4 orders; parts 1,2 together in 3 of them; part 3 alone in one.
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.all("q202_assoc_rules")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // supp(1)=3, supp(2)=3, supp(12)=3, N=4:
    // conf(1→2) = 3/3 = 1.0; lift = 3·4/(3·3) = 1.3333.
    assert(got.toSeq == Seq((1L, 2L, 3L, 1.0, 1.3333)), s"got ${got.toSeq}")
  }

  // ---- q203 KL divergence ---------------------------------------------

  test("kl divergence: identical distribution scores 0; a shifted one scores > 0") {
    val dir = tmp("graft_kl_")
    Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha beta gamma", "same"),   // token-identical to en
      (3L, "alpha alpha alpha", "skew"))  // mass concentrated
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.all("q203_kl_divergence")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("same") == 0.0, s"identical dists must give KL 0, got $got")
    assert(got("skew") > 0.1, s"shifted dist must give KL > 0, got $got")
  }

  // ---- q204 JL projection ---------------------------------------------

  test("jl projection: linearity — a negated vector projects to the exact negation") {
    val dir = tmp("graft_jl_")
    val v = (0 until 64).map(i => 0.01f * ((i % 13) - 6)).toArray
    Seq((0L, v.toSeq), (1L, v.map(-_).toSeq))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Queries.all("q204_jl_projection")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 2)
    val (_, a0, a1, a2, a3) = got(0)
    val (_, b0, b1, b2, b3) = got(1)
    // The sign matrix is fixed by md5, so projection is linear:
    // proj(−x) = −proj(x) in exact double arithmetic (± rounding at 4dp).
    assert((a0 + b0).abs < 1e-9 && (a1 + b1).abs < 1e-9 &&
      (a2 + b2).abs < 1e-9 && (a3 + b3).abs < 1e-9, s"got $got")
    // And the hash signs are non-trivial: not all four dims collapse to
    // the same magnitude (the sign patterns differ across j).
    assert(Set(a0.abs, a1.abs, a2.abs, a3.abs).size > 1)
  }

  // ---- q205 attribution -----------------------------------------------

  test("attribution: purchases credit the last strictly-prior click within 7 days, else nothing") {
    val dir = tmp("graft_attr_")
    def ev(id: Long, t: String, u: Long, typ: String, k: Long, v: Double) =
      (id, ts(t), u, typ, s"""{"k": $k}""", v)
    Seq(
      // user 1: click(k=7) → click(k=9) → purchase: credits k=9 (last wins)
      ev(1, "2024-01-01 08:00:00", 1, "click", 7, 0.0),
      ev(2, "2024-01-01 09:00:00", 1, "click", 9, 0.0),
      ev(3, "2024-01-01 10:00:00", 1, "purchase", 0, 50.0),
      // user 2: purchase BEFORE any click → uncredited
      ev(4, "2024-01-02 08:00:00", 2, "purchase", 0, 30.0),
      ev(5, "2024-01-02 09:00:00", 2, "click", 5, 0.0),
      // user 3: click 8 days before purchase → outside window, uncredited
      ev(6, "2024-01-01 08:00:00", 3, "click", 4, 0.0),
      ev(7, "2024-01-09 09:00:00", 3, "purchase", 0, 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.all("q205_attribution")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((9L, 1L, 50.0)), s"got ${got.toSeq}")
  }
}
