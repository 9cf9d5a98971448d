package graft

import org.apache.spark.sql.functions._

/** Construction-based ground truth for the q261-q264 additions: a
  * hand-computed Mann-Whitney U with tie-averaged ranks, a
  * hand-computed Kaplan-Meier curve with a right-censored user, a
  * mirrored-arithmetic PSI check, the 2-D skyline with dominance ties
  * on both axes, and both physical paths of the new
  * PrefixSum.runningMaxExclusive scan.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  private def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  private def writeEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // ---- PrefixSum.runningMaxExclusive ----------------------------------

  test("runningMaxExclusive: hand values, and both physical paths agree") {
    import graft.operators.PrefixSum
    val df = Seq((1L, 5L), (2L, 3L), (3L, 7L), (4L, 7L)).toDF("k", "v")
    val want = Map(1L -> Long.MinValue, 2L -> 5L, 3L -> 5L, 4L -> 7L)
    for (smallBytes <- Seq(64L << 20, 0L)) { // window path, distributed path
      val got = PrefixSum.runningMaxExclusive(df, "k", "v", "pm",
        numPartitions = 2, smallInputBytes = smallBytes)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"smallBytes=$smallBytes got $got")
    }
  }

  // ---- q261 Mann-Whitney ----------------------------------------------

  test("mann-whitney: hand-computed U and tie-corrected z") {
    val dir = tmp("graft_mw_")
    // 2024-01-01 is a Monday (weekday), 2024-01-06 a Saturday (weekend).
    // Weekday values {1,2,3}, weekend {2,3,4}: pooled ranks 1, 2.5/2.5,
    // 4.5/4.5, 6 → R_a = 1+2.5+4.5 = 8, U_a = 8 − 3·4/2 = 2.
    // tie3 = 6+6 = 12; σ² = (9/12)·(7 − 12/30) = 4.95;
    // z = (2 − 4.5)/√4.95 = −1.1237 (round 4).
    val wkday = ts("2024-01-01 09:00:00"); val wkend = ts("2024-01-06 09:00:00")
    writeEvents(dir,
      Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
        (i.toLong, wkday, 1L, "purchase", "{}", v) } ++
      Seq(2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        (10L + i, wkend, 2L, "purchase", "{}", v) } ++
      Seq((99L, wkday, 3L, "view", "{}", 100.0))) // non-purchase excluded
    val r = Queries.all("q261_mann_whitney")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L, s"got $r")
    assert(r.getDouble(2) == 2.0, s"U_a: got $r")
    assert(r.getDouble(3) == BigDecimal(-2.5 / math.sqrt(4.95))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"z: got $r")
  }

  // ---- q262 Kaplan-Meier ----------------------------------------------

  test("kaplan-meier: hand-computed curve with censored non-converters") {
    val dir = tmp("graft_km_")
    // u1 converts same-day (death t=0), u2 at lag 2 (death t=2), u3
    // never purchases (CENSORED at 5), u4 purchases at lag 9 — outside
    // the 5-day attribution window (CENSORED at 5).
    // t=0: n=4, d=1 → S=0.75 ; t=2: n=3, d=1 → S=0.75·(2/3)=0.5 ;
    // t=5: d=0 (no output row — censorings only).
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "view", "{}", 1.0),
      (2L, ts("2024-01-01 09:00:00"), 1L, "purchase", "{}", 1.0),
      (3L, ts("2024-01-01 08:00:00"), 2L, "view", "{}", 1.0),
      (4L, ts("2024-01-03 08:00:00"), 2L, "purchase", "{}", 1.0),
      (5L, ts("2024-01-01 08:00:00"), 3L, "view", "{}", 1.0),
      (6L, ts("2024-01-20 08:00:00"), 3L, "view", "{}", 1.0),
      (7L, ts("2024-01-01 08:00:00"), 4L, "view", "{}", 1.0),
      (8L, ts("2024-01-10 08:00:00"), 4L, "purchase", "{}", 1.0)))
    val got = Queries.all("q262_kaplan_meier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 4L, 1L, 0.75), (2L, 3L, 1L, 0.5)), s"got ${got.toSeq}")
  }

  test("kaplan-meier: full conversion drives survival to exactly 0") {
    val dir = tmp("graft_km0_")
    // u1 converts at t=0, u2 at t=2 — the last death exhausts the risk
    // set (d = n_risk), which must yield surv = 0.0 exactly, never a
    // ln(0) (Spark nulls it, DuckDB raises — the sf0.001 edge).
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "purchase", "{}", 1.0),
      (2L, ts("2024-01-01 08:00:00"), 2L, "view", "{}", 1.0),
      (3L, ts("2024-01-03 08:00:00"), 2L, "purchase", "{}", 1.0)))
    val got = Queries.all("q262_kaplan_meier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 2L, 1L, 0.5), (2L, 1L, 1L, 0.0)), s"got ${got.toSeq}")
  }

  // ---- q263 PSI drift -------------------------------------------------

  test("psi drift: mirrored-arithmetic check on a two-bin shift") {
    val dir = tmp("graft_psi_")
    // Range Jan-01..Jan-31; late ⟺ offset·2 > 30 ⟺ after Jan-16.
    // Early values {0, 10} → bins {0, 9}; late {10, 10} → bin 9 twice.
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "purchase", "{}", 0.0),
      (2L, ts("2024-01-02 08:00:00"), 1L, "purchase", "{}", 10.0),
      (3L, ts("2024-01-30 08:00:00"), 2L, "purchase", "{}", 10.0),
      (4L, ts("2024-01-31 08:00:00"), 2L, "purchase", "{}", 10.0)))
    def psi(na: Long, nb: Long, ta: Long, tb: Long): Double = {
      val pa = (na + 0.5) / (ta + 5.0); val pb = (nb + 0.5) / (tb + 5.0)
      BigDecimal((pa - pb) * math.log(pa / pb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Queries.all("q263_psi_drift")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, psi(1, 0, 2, 2)),
      (9L, 1L, 2L, psi(1, 2, 2, 2))), s"got ${got.toSeq}")
  }

  // ---- q265 Tukey HSD -------------------------------------------------

  test("tukey hsd: hand-computed pairwise q statistic") {
    val dir = tmp("graft_hsd_")
    // Sundays (Jan 7/14) see 2 and 4 purchases, Mondays (Jan 1/8) 1
    // and 3: group moments give MSW = (2+2)/2 = 2, means 3 vs 2 →
    // q = (3−2)/√(2/2·(1/2+1/2)) = 1.0 for the single pair (1,2).
    def burst(day: String, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, ts(s"$day 10:0$i:00"), 1L, "purchase", "{}", 1.0))
    writeEvents(dir,
      burst("2024-01-07", 2, 100) ++ burst("2024-01-14", 4, 200) ++
        burst("2024-01-01", 1, 300) ++ burst("2024-01-08", 3, 400))
    val got = Queries.all("q265_tukey_hsd")(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0, s"got $r")
  }

  // ---- q266 seasonal decompose ----------------------------------------

  test("seasonal decompose: hand-computed trend/seasonal/resid") {
    val dir = tmp("graft_seas_")
    // 9 consecutive days of revenue 7 except day 8 = 14. Full 7-day
    // windows exist for days 4-6: trend 7, 8, 8 → detrended 0, −1, −1;
    // each lands on a distinct weekday so seasonal ≡ detrended and the
    // residual is exactly 0.
    val revs = Seq(7.0, 7.0, 7.0, 7.0, 7.0, 7.0, 7.0, 14.0, 7.0)
    writeEvents(dir, revs.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(f"2024-01-${i + 1}%02d 12:00:00"), 1L, "purchase", "{}", v) })
    val got = Queries.all("q266_seasonal_decompose")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2024-01-04", 7.0, 7.0, 0.0, 0.0),
      ("2024-01-05", 7.0, 8.0, -1.0, 0.0),
      ("2024-01-06", 7.0, 8.0, -1.0, 0.0)), s"got ${got.toSeq}")
  }

  // ---- q267 covariate balance -----------------------------------------

  test("covariate balance: hand SMD plus the zero-variance NULL rule") {
    val dir = tmp("graft_smd_")
    // Pick two train-side and two holdout-side user ids with the q90
    // hash, give them 2/4 and 1/3 single-day view events: n_events and
    // total_value get mean_t=3, mean_c=2, var=2 both sides →
    // SMD = 1/√2 = 0.7071; active_days and n_types are constant 1 →
    // zero pooled variance → NULL (the q259 guard).
    def side(id: Long): Long =
      if (((id * 2654435761L) % 4294967296L) % 100 < 80) 1L else 0L
    val ids = (1L to 100L)
    val train = ids.filter(side(_) == 1L).take(2)
    val hold = ids.filter(side(_) == 0L).take(2)
    val day = ts("2024-01-01 10:00:00")
    def evs(uid: Long, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, day, uid, "view", "{}", 1.0))
    writeEvents(dir,
      evs(train(0), 2, 100) ++ evs(train(1), 4, 200) ++
        evs(hold(0), 1, 300) ++ evs(hold(1), 3, 400))
    val got = Queries.all("q267_covariate_balance")(spark, dir).collect()
    val byFeat = got.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    val smd = BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byFeat("n_events") == ((2L, 2L, 3.0, 2.0, Some(smd))), s"got $byFeat")
    assert(byFeat("total_value") == ((2L, 2L, 3.0, 2.0, Some(smd))))
    assert(byFeat("active_days") == ((2L, 2L, 1.0, 1.0, None)))
    assert(byFeat("n_types") == ((2L, 2L, 1.0, 1.0, None)))
  }

  // ---- q268 hard negatives --------------------------------------------

  test("hard negatives: rank-1 positive and the 11-13 band by angle") {
    val dir = tmp("graft_neg_")
    // Probes 0-4 all point along [1,0]; corpus vectors 5..24 sit at
    // increasing angles so cosine strictly decreases with vec_id:
    // rank r holds vec_id 4+r for every probe → positive = 5,
    // hard negatives = {15, 16, 17}.
    val rows = (0L to 4L).map(i => (i, Array(1.0f, 0.0f), 0)) ++
      (5L to 24L).map { i =>
        val th = (i - 4) * math.Pi / 60
        (i, Array(math.cos(th).toFloat, math.sin(th).toFloat), 1)
      }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Queries.all("q268_hard_negatives")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.length == 20)
    for (q <- 0L to 4L) {
      val mine = got.filter(_._1 == q).map(t => (t._2, t._3, t._4)).toSeq
      assert(mine == Seq((1L, "positive", 5L), (11L, "hard_negative", 15L),
        (12L, "hard_negative", 16L), (13L, "hard_negative", 17L)), s"q=$q got $mine")
    }
  }

  // ---- q269 runs test -------------------------------------------------

  test("runs test: hand-computed runs and z on a trending series") {
    val dir = tmp("graft_runs_")
    // Six days of strictly rising revenue 1..6: lower median = 3,
    // above-median signs 0,0,0,1,1,1 → runs = 2, n1 = n0 = 3.
    // μ = 2·9/6 + 1 = 4; σ² = 2·3·3·(18−6)/(36·5) = 1.2;
    // z = (2 − 4)/√1.2 = −1.8257.
    writeEvents(dir, (1 to 6).map(i =>
      (i.toLong, ts(f"2024-01-$i%02d 12:00:00"), 1L, "purchase", "{}", i.toDouble)))
    val r = Queries.all("q269_runs_test")(spark, dir).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L && r.getLong(2) == 3L, s"got $r")
    assert(r.getDouble(3) == BigDecimal(-2.0 / math.sqrt(1.2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"got $r")
  }

  // ---- q270 QQ deciles ------------------------------------------------

  test("qq deciles: shifted uniform gives a constant gap") {
    val dir = tmp("graft_qq_")
    // 20 weekday purchases valued 1..20 (Mon Jan 1), 20 weekend valued
    // 101..120 (Sat Jan 6): each decile holds 2 values, decile max is
    // 2d on one side and 100 + 2d on the other → gap ≡ 100.
    writeEvents(dir,
      (1 to 20).map(i => (i.toLong, ts("2024-01-01 10:00:00"), 1L,
        "purchase", "{}", i.toDouble)) ++
      (1 to 20).map(i => (100L + i, ts("2024-01-06 10:00:00"), 2L,
        "purchase", "{}", 100.0 + i)))
    val got = Queries.all("q270_qq_deciles")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == (1 to 10).map(d =>
      (d.toLong, 2.0 * d, 100.0 + 2 * d, 100.0)), s"got ${got.toSeq}")
  }

  // ---- q271 JS divergence ---------------------------------------------

  test("js divergence: mirrored arithmetic on a two-source corpus") {
    val dir = tmp("graft_jsd_")
    // srcA = "a a b" (a:2/3, b:1/3), srcB = "a c" (a:1/2, c:1/2):
    // JSD = (1/3)ln(8/7) + (1/4)ln(6/7) + (1/6)ln 2 + (1/4)ln 2.
    Seq((1L, "a a b", "en", "srcA", 5L), (2L, "a c", "en", "srcB", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = BigDecimal(
      (1.0 / 3) * math.log(8.0 / 7) + (1.0 / 4) * math.log(6.0 / 7) +
        (1.0 / 6) * math.log(2) + (1.0 / 4) * math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Queries.all("q271_js_divergence")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("srcA", "srcB", want)), s"got ${got.toSeq} want $want")
  }

  // ---- q272 Cohen's d -------------------------------------------------

  test("cohens d: hand-computed effect size with Hedges correction") {
    val dir = tmp("graft_cd_")
    // Weekday {1,2,3} vs weekend {2,3,4}: both variances 1, pooled
    // SD 1 → d = (2−3)/1 = −1; g = d·(1 − 3/(4·6−9)) = −0.8.
    val wkday = ts("2024-01-01 09:00:00"); val wkend = ts("2024-01-06 09:00:00")
    writeEvents(dir,
      Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
        (i.toLong, wkday, 1L, "purchase", "{}", v) } ++
      Seq(2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        (10L + i, wkend, 2L, "purchase", "{}", v) })
    val r = Queries.all("q272_cohens_d")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L &&
      r.getDouble(2) == 2.0 && r.getDouble(3) == 3.0 &&
      r.getDouble(4) == -1.0 && r.getDouble(5) == -0.8, s"got $r")
  }

  // ---- q273 Mann-Kendall ----------------------------------------------

  test("mann-kendall: strictly rising series gives S = C(n,2)") {
    val dir = tmp("graft_mk_")
    // Revs 1,2,3 over 3 days: S = 3, no ties → 18·Var = 3·2·11 = 66,
    // z = (3−1)/√(66/18) = 1.0445.
    writeEvents(dir, (1 to 3).map(i =>
      (i.toLong, ts(f"2024-01-0$i 12:00:00"), 1L, "purchase", "{}", i.toDouble)))
    val r = Queries.all("q273_mann_kendall")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L, s"got $r")
    assert(r.getDouble(2) == BigDecimal(2.0 / math.sqrt(66.0 / 18))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"got $r")
  }

  // ---- q274 TOST equivalence ------------------------------------------

  test("tost: identical tiny sides compute symmetric z, not equivalent") {
    val dir = tmp("graft_tost_")
    // Both sides hold values {10,12}: diff 0, margin 0.55, Welch SE √2
    // → z = ±0.3889 — inside ±1.645, so equivalence is NOT claimed
    // (underpowered, the whole point of TOST vs "p > 0.05 means same").
    def side(id: Long): Long =
      if (((id * 2654435761L) % 4294967296L) % 100 < 80) 1L else 0L
    val ids = (1L to 100L)
    val train = ids.filter(side(_) == 1L).take(2)
    val hold = ids.filter(side(_) == 0L).take(2)
    val day = ts("2024-01-01 10:00:00")
    writeEvents(dir, Seq(
      (1L, day, train(0), "purchase", "{}", 10.0),
      (2L, day, train(1), "purchase", "{}", 12.0),
      (3L, day, hold(0), "purchase", "{}", 10.0),
      (4L, day, hold(1), "purchase", "{}", 12.0)))
    val r = Queries.all("q274_tost_equivalence")(spark, dir).collect()(0)
    val z = BigDecimal(0.55 / math.sqrt(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L &&
      r.getDouble(2) == 11.0 && r.getDouble(3) == 11.0 &&
      r.getDouble(4) == 0.55 && r.getDouble(5) == z &&
      r.getDouble(6) == -z && !r.getBoolean(7), s"got $r")
  }

  // ---- q275 HHI concentration -----------------------------------------

  test("hhi: 60/40 two-nation region gives 5200") {
    val dir = tmp("graft_hhi_")
    Seq((1L, "R1")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1L, "NA", 1L), (2L, "NB", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 60.0), (2L, 2L, 40.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Queries.all("q275_hhi_concentration")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // shares 0.6/0.4 → 10000·(0.36 + 0.16) = 5200
    assert(got.toSeq == Seq(("R1", 2L, 5200.0)), s"got ${got.toSeq}")
  }

  // ---- q276 Jarque-Bera -----------------------------------------------

  test("jarque-bera: symmetric three-day series, mirrored arithmetic") {
    val dir = tmp("graft_jb_")
    // Daily revs {1,2,3}: symmetric → skewness exactly 0; kurtosis and
    // JB recomputed here with the query's own expression order so the
    // assertion is bit-faithful.
    writeEvents(dir, (1 to 3).map(i =>
      (i.toLong, ts(f"2024-01-0$i 12:00:00"), 1L, "purchase", "{}", i.toDouble)))
    val n = 3.0; val s1 = 6.0; val s2 = 14.0; val s3 = 36.0; val s4 = 98.0
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - m * (s2 / n) * 3 + m * m * m * 2
    val m4 = s4 / n - m * (s3 / n) * 4 + m * m * (s2 / n) * 6 - m * m * m * m * 3
    val sk = m3 / math.sqrt(m2 * m2 * m2); val ku = m4 / (m2 * m2)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Queries.all("q276_jarque_bera")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getDouble(1) == r4(sk) &&
      r.getDouble(2) == r4(ku - 3) &&
      r.getDouble(3) == r4(n / 6.0 * (sk * sk + (ku - 3) * (ku - 3) / 4.0)),
      s"got $r")
  }

  // ---- q277 Grubbs ----------------------------------------------------

  test("grubbs: the extreme day is selected with its studentized deviate") {
    val dir = tmp("graft_grubbs_")
    // Daily revs {1,2,3,10}: mean 4, sample var 50/3 → the Jan-4 spike
    // wins with G = 6/√(50/3).
    writeEvents(dir, Seq(1.0, 2.0, 3.0, 10.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(f"2024-01-0${i + 1} 12:00:00"), 1L, "purchase", "{}", v) })
    val r = Queries.all("q277_grubbs")(spark, dir).collect()(0)
    val g = BigDecimal(6.0 / math.sqrt((114.0 - 16.0 * 16.0 / 4.0) / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 4L && r.getDate(1).toString == "2024-01-04" &&
      r.getDouble(2) == 10.0 && r.getDouble(3) == g, s"got $r")
  }

  // ---- q278 Levene ----------------------------------------------------

  test("levene: hand-computed W for unequal weekday spreads") {
    val dir = tmp("graft_levene_")
    // Sundays (Jan 7/14/21) see 1/5/3 purchases (z = 2,2,0), Mondays
    // (Jan 1/8) 3/3 (z = 0,0): ssb_part = 16/3, SSB = 16/3 − 16/5,
    // SSW = 8 − 16/3 → W = (SSB/1)/(SSW/3) = 2.4.
    def burst(day: String, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, ts(s"$day 10:0$i:00"), 1L, "purchase", "{}", 1.0))
    writeEvents(dir,
      burst("2024-01-07", 1, 100) ++ burst("2024-01-14", 5, 200) ++
        burst("2024-01-21", 3, 300) ++
        burst("2024-01-01", 3, 400) ++ burst("2024-01-08", 3, 500))
    val r = Queries.all("q278_levene")(spark, dir).collect()(0)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ssb = 16.0 / 3 - 16.0 / 5; val ssw = 8.0 - 16.0 / 3
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L &&
      r.getDouble(2) == r4(ssb) && r.getDouble(3) == r4(ssw / 3) &&
      r.getDouble(4) == r4(ssb / (ssw / 3)), s"got $r")
  }

  // ---- q279 Cronbach's alpha ------------------------------------------

  test("cronbach alpha: hand-computed from integer item moments") {
    val dir = tmp("graft_alpha_")
    // u1: click+purchase (tot 2); u2: error+purchase+2 views (tot 4).
    // Item variances 0.5+0.5+0+0+2 = 3, total variance 2 →
    // alpha = 5/4·(1 − 3/2) = −0.625 (negative is legal: the items
    // anti-covary in this tiny fixture).
    val day = ts("2024-01-01 10:00:00")
    writeEvents(dir, Seq(
      (1L, day, 1L, "click", "{}", 1.0), (2L, day, 1L, "purchase", "{}", 1.0),
      (3L, day, 2L, "error", "{}", 1.0), (4L, day, 2L, "purchase", "{}", 1.0),
      (5L, day, 2L, "view", "{}", 1.0), (6L, day, 2L, "view", "{}", 1.0)))
    val r = Queries.all("q279_cronbach_alpha")(spark, dir).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L &&
      r.getDouble(2) == -0.625, s"got $r")
  }

  // ---- q280 Tukey fences ----------------------------------------------

  test("tukey fences: rank-picked quartiles and the spike census") {
    val dir = tmp("graft_fence_")
    // Revs 1..7 plus a 100 spike: Q1 = rank ⌈8/4⌉ = 2 → 2, Q3 = rank 6
    // → 6, fences [−4, 12] → exactly the spike sits above.
    writeEvents(dir, (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0))
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, ts(f"2024-01-0${i + 1}%01d 12:00:00".take(19)), 1L,
          "purchase", "{}", v) })
    val r = Queries.all("q280_tukey_fences")(spark, dir).collect()(0)
    assert(r.getLong(0) == 8L && r.getDouble(1) == 2.0 && r.getDouble(2) == 6.0 &&
      r.getLong(3) == 0L && r.getLong(4) == 1L, s"got $r")
  }

  // ---- q281 token coverage --------------------------------------------

  test("token coverage: top-10 mass over a 12-word Zipf-ish corpus") {
    val dir = tmp("graft_cov_")
    // Word wNN appears 14−NN times (counts 13..2, total 90); the top
    // 10 cover 13+12+...+4 = 85 → coverage 85/90.
    val text = (1 to 12).flatMap(i => Seq.fill(14 - i)(f"w$i%02d")).mkString(" ")
    Seq((1L, text, "en", "srcA", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.all("q281_token_coverage")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val cov = BigDecimal(85.0 / 90.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((10L, 85L, 90L, 12L, cov)), s"got ${got.toSeq}")
  }

  // ---- q282 burstiness ------------------------------------------------

  test("burstiness: metronome B = −1, bursty user B = 1/3") {
    val dir = tmp("graft_burst_")
    // u1: 6 events one second apart → gaps all 1 → σ = 0, B = −1.
    // u2: 5 simultaneous events then one 10 s later → gaps 0,0,0,0,10
    // → μ = 2, σ = 4, B = (4−2)/(4+2) = 1/3. mean_b = −1/3.
    val u1 = (0 to 5).map(i =>
      (i.toLong, ts(s"2024-01-01 10:00:0$i"), 1L, "view", "{}", 1.0))
    val u2 = (0 to 4).map(i =>
      (10L + i, ts("2024-01-01 10:00:00"), 2L, "view", "{}", 1.0)) :+
      (15L, ts("2024-01-01 10:00:10"), 2L, "view", "{}", 1.0)
    writeEvents(dir, u1 ++ u2)
    val r = Queries.all("q282_burstiness")(spark, dir).collect()(0)
    val want = BigDecimal((-1.0 + 1.0 / 3) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 2L && r.getDouble(1) == want &&
      r.getLong(2) == 1L && r.getLong(3) == 1L, s"got $r")
  }

  // ---- q283 watermark impact ------------------------------------------

  test("watermark impact: one 70s-late purchase prices the 0/60s rows") {
    val dir = tmp("graft_wm_")
    // Arrival order = event_id; id3's event time sits 70 s behind the
    // running max, so it drops at watermarks 0 and 60 but survives
    // 600/3600; it is a 5.00 purchase, so that is the revenue at risk.
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", "{}", 1.0),
      (2L, ts("2024-01-01 10:01:40"), 1L, "view", "{}", 1.0),
      (3L, ts("2024-01-01 10:00:30"), 1L, "purchase", "{}", 5.0),
      (4L, ts("2024-01-01 10:03:20"), 1L, "view", "{}", 1.0)))
    val got = Queries.all("q283_watermark_impact")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, 0.25, 5.0), (60L, 4L, 1L, 0.25, 5.0),
      (600L, 4L, 0L, 0.0, 0.0), (3600L, 4L, 0L, 0.0, 0.0)), s"got ${got.toSeq}")
  }

  // ---- q284 sort advisor ----------------------------------------------

  test("sort advisor: correlated keys cluster, interleaved price does not") {
    val dir = tmp("graft_sort_")
    // 64 orders: date = day i, cust = 63−i (perfectly anti-correlated
    // — still perfectly CLUSTERED), price interleaves two far-apart
    // ramps (even i → i, odd i → 630+i). Sorting by date or cust gives
    // per-bucket spans of 1 day / 1 cust / ~631 price; sorting by
    // price gives spans 2/2/2.
    val base = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 64).map { i =>
      (i.toLong, (63 - i).toLong, (i % 2) * 630.0 + i,
        java.sql.Timestamp.valueOf(base.plusDays(i).atStartOfDay()))
    }
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Queries.all("q284_sort_advisor")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      ("k_cust", r4(1.0 / 63), r4(1.0 / 63), r4(631.0 / 693)),
      ("k_date", r4(1.0 / 63), r4(1.0 / 63), r4(631.0 / 693)),
      ("k_price", r4(2.0 / 63), r4(2.0 / 63), r4(2.0 / 693))), s"got ${got.toSeq}")
  }

  // ---- q285 mutual information ----------------------------------------

  test("mutual information: perfectly dependent 2x2 gives MI = H = ln 2") {
    val dir = tmp("graft_mi_")
    // clicks only on Monday, views only on Saturday, two each:
    // MI = H(type) = H(weekday) = ln 2.
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", "{}", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", "{}", 1.0),
      (3L, ts("2024-01-06 10:00:00"), 2L, "view", "{}", 1.0),
      (4L, ts("2024-01-06 11:00:00"), 2L, "view", "{}", 1.0)))
    val r = Queries.all("q285_mutual_information")(spark, dir).collect()(0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(0) == ln2 && r.getDouble(1) == ln2 &&
      r.getDouble(2) == ln2, s"got $r")
  }

  // ---- q286 delta bitwidth --------------------------------------------

  test("delta bitwidth: exact bin-length widths per column") {
    val dir = tmp("graft_bits_")
    // orderkeys {0,1,2,10}: span 10 (4 bits), max gap 8 (4 bits) → 0%
    // saved; custkeys {0,2,4,6}: span 6 (3 bits), gap 2 (2 bits);
    // 4 consecutive days: span 3 d (38 bits µs), gap 1 d (37 bits).
    val base = java.time.LocalDate.parse("2024-01-01")
    Seq(0L, 1L, 2L, 10L).zip(Seq(0L, 2L, 4L, 6L)).zipWithIndex.map {
      case ((ok, ck), i) =>
        (ok, ck, java.sql.Timestamp.valueOf(base.plusDays(i).atStartOfDay()))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def bits(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    def pct(d: Long, r: Long) = BigDecimal((1.0 - d.toDouble / r) * 100)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dayUs = 86400000000L
    val got = Queries.all("q286_delta_bitwidth")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("custkey", 4L, bits(6), 2L, bits(2), pct(bits(2), bits(6))),
      ("orderdate", 4L, bits(3 * dayUs), dayUs, bits(dayUs),
        pct(bits(dayUs), bits(3 * dayUs))),
      ("orderkey", 4L, bits(10), 8L, bits(8), pct(bits(8), bits(10)))),
      s"got ${got.toSeq}")
  }

  // ---- q287 SAX words -------------------------------------------------

  test("sax words: flat week reads 'bbbbbbb', the spike week 'd'") {
    val dir = tmp("graft_sax_")
    // Revs 10×7 then 18: mean 11, sample sd √8 → z(10) = −0.354 ('b'),
    // z(18) = 2.47 ('d'). Jan 1 2024 is a Monday, so days 1-7 are one
    // ISO week and day 8 starts the next.
    writeEvents(dir, (0 until 8).map { i =>
      val base = java.time.LocalDate.parse("2024-01-01").plusDays(i)
      (i.toLong, java.sql.Timestamp.valueOf(base.atTime(12, 0)), 1L,
        "purchase", "{}", if (i == 7) 18.0 else 10.0)
    })
    val got = Queries.all("q287_sax_words")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 7L, "bbbbbbb"), ("2024-01-08", 1L, "d")), s"got ${got.toSeq}")
  }

  // ---- q288 session timeout advisor -----------------------------------

  test("session timeout: bucket shares and the keeps_95 knee flag") {
    val dir = tmp("graft_sess_")
    // u1 contributes three 1 s gaps (bucket 1 bit), u2 one 8 s gap
    // (bucket 4 bits): cumulative shares 0.75 then 1.0 — the 95% knee
    // lands on the 4-bit bucket (timeout 2^4 s).
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", "{}", 1.0),
      (2L, ts("2024-01-01 10:00:01"), 1L, "view", "{}", 1.0),
      (3L, ts("2024-01-01 10:00:02"), 1L, "view", "{}", 1.0),
      (4L, ts("2024-01-01 10:00:03"), 1L, "view", "{}", 1.0),
      (5L, ts("2024-01-01 10:00:00"), 2L, "view", "{}", 1.0),
      (6L, ts("2024-01-01 10:00:08"), 2L, "view", "{}", 1.0)))
    val got = Queries.all("q288_session_timeout")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, 3L, 0.75, false), (4L, 1L, 1.0, true)),
      s"got ${got.toSeq}")
  }

  // ---- q289 information-gain split ------------------------------------

  test("info gain: the clean class boundary wins with IG = ln 2") {
    val dir = tmp("graft_ig_")
    // 10 clicks valued 1..10, 10 views valued 11..20: decile d holds
    // values {2d−1, 2d}, so split 5 separates the classes exactly
    // (IG = H(type) = ln 2); every other split is strictly worse.
    writeEvents(dir,
      (1 to 10).map(i => (i.toLong, ts("2024-01-01 10:00:00"), 1L,
        "click", "{}", i.toDouble)) ++
      (11 to 20).map(i => (i.toLong, ts("2024-01-01 10:00:00"), 1L,
        "view", "{}", i.toDouble)))
    def plogp(num: Double, den: Double) =
      if (num > 0) (num / den) * math.log(num / den) else 0.0
    def ig(s: Int): Double = {
      val cb = math.min(2 * s, 10).toDouble; val vb = math.max(0, 2 * s - 10).toDouble
      val bb = cb + vb; val aa = 20 - bb
      BigDecimal((bb / 20) * (plogp(cb, bb) + plogp(vb, bb)) +
        (aa / 20) * (plogp(10 - cb, aa) + plogp(10 - vb, aa)) -
        (plogp(10, 20) + plogp(10, 20)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Queries.all("q289_info_gain_split")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == (1 to 9).map(sp =>
      (sp.toLong, (2 * sp).toLong, ig(sp), sp == 5)), s"got ${got.toSeq}")
  }

  // ---- q290 SRM check -------------------------------------------------

  test("srm check: an exactly-80/20 allocation scores chi2 = 0") {
    val dir = tmp("graft_srm_")
    def side(id: Long): Long =
      if (((id * 2654435761L) % 4294967296L) % 100 < 80) 1L else 0L
    val ids = (1L to 200L)
    val train = ids.filter(side(_) == 1L).take(8)
    val hold = ids.filter(side(_) == 0L).take(2)
    val day = ts("2024-01-01 10:00:00")
    writeEvents(dir, (train ++ hold).zipWithIndex.map { case (uid, i) =>
      (i.toLong, day, uid, "view", "{}", 1.0) })
    val r = Queries.all("q290_srm_check")(spark, dir).collect()(0)
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L &&
      r.getDouble(2) == 8.0 && r.getDouble(3) == 2.0 &&
      r.getDouble(4) == 0.0 && !r.getBoolean(5), s"got $r")
  }

  // ---- q291 join-order advisor ----------------------------------------

  test("join order: measured intermediates pick customer_first") {
    val dir = tmp("graft_jo_")
    Seq((1L, "ASIA"), (2L, "EUROPE")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // c1 (ASIA) owns o1/o2; c2 owns o3/o4. Heavy lineitems hit o1 once
    // and o3 twice → customer_first materializes 2 rows, lineitem_first
    // 3; the final join keeps only o1's match.
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 30.0), (1L, 10.0), (3L, 30.0), (3L, 40.0))
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.all("q291_join_order_advisor")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("customer_first", 2L, 1L, 0.5, true),
      ("lineitem_first", 3L, 1L, BigDecimal(1.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, false)),
      s"got ${got.toSeq}")
  }

  // ---- q292 codec advisor ---------------------------------------------

  test("codec advisor: run counts, dictionary widths, and the rules") {
    val dir = tmp("graft_codec_")
    // 12 orders: status in 2-blocks (6 runs, 2 distinct → dict),
    // priority constant (1 run → rle), custkey all-distinct (dict, 4
    // index bits).
    val status = Seq("O", "O", "F", "F", "O", "O", "F", "F", "O", "O", "F", "F")
    (1 to 12).map(i => (i.toLong, status(i - 1), "HIGH", i.toLong))
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Queries.all("q292_codec_advisor")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getString(6)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      ("custkey", 12L, 12L, 4L, 12L, 1.0, "dict"),
      ("orderpriority", 12L, 1L, 1L, 1L, r6(1.0 / 12), "rle"),
      ("orderstatus", 12L, 2L, 1L, 6L, 0.5, "dict")), s"got ${got.toSeq}")
  }

  // ---- q293 power-law alpha / q294 cold-start -------------------------

  test("hill alpha and cold-start bands on a three-part catalog") {
    val dir = tmp("graft_hill_")
    // p1 in 25 orders (warm, at d_min), p2 in 50 (hot), p3 in 10
    // (cold, below the tail): Hill α = 1 + 2/(ln 1 + ln 2); every row
    // is a 1.00 lineitem so revenue tracks the counts exactly.
    val rows =
      (1 to 25).map(o => (1L, o.toLong, 1.0)) ++
      (101 to 150).map(o => (2L, o.toLong, 1.0)) ++
      (201 to 210).map(o => (3L, o.toLong, 1.0))
    rows.toDF("l_partkey", "l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val h = Queries.all("q293_powerlaw_alpha")(spark, dir).collect()(0)
    val alpha = BigDecimal(1.0 + 2.0 / math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h.getLong(0) == 3L && h.getLong(1) == 25L && h.getLong(2) == 2L &&
      h.getDouble(3) == alpha, s"got $h")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Queries.all("q294_catalog_coldstart")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("1_cold", 1L, r6(1.0 / 3), 10.0, r6(1000.0 / 8500)),
      ("2_warm", 1L, r6(1.0 / 3), 25.0, r6(2500.0 / 8500)),
      ("3_hot", 1L, r6(1.0 / 3), 50.0, r6(5000.0 / 8500))), s"got ${got.toSeq}")
  }

  // ---- q295 Mood's median / q296 partition planner --------------------

  test("mood median: disjoint halves give the maximal 2x2 chi2") {
    val dir = tmp("graft_mood_")
    // Weekday {1,2,3,4}, weekend {5,6,7,8}: pooled lower median = 4
    // (ties count as not-above) → table (0,4 | 4,0) → chi2 = 8.
    val wkday = ts("2024-01-01 09:00:00"); val wkend = ts("2024-01-06 09:00:00")
    writeEvents(dir,
      (1 to 4).map(i => (i.toLong, wkday, 1L, "purchase", "{}", i.toDouble)) ++
        (5 to 8).map(i => (i.toLong, wkend, 2L, "purchase", "{}", i.toDouble)))
    val r = Queries.all("q295_mood_median")(spark, dir).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 4L && r.getLong(2) == 4L &&
      r.getLong(3) == 0L && r.getDouble(4) == 8.0, s"got $r")
  }

  test("partition planner: exact byte estimate and ceil file count") {
    val dir = tmp("graft_part_")
    // Two events, each 32 fixed + 4 ('view') + 2 ('{}') = 38 bytes →
    // 76 bytes, one 1 MiB file.
    writeEvents(dir, Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", "{}", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view", "{}", 1.0)))
    val r = Queries.all("q296_partition_planner")(spark, dir).collect()(0)
    assert(r.getDate(0).toString == "2024-01-01" && r.getLong(1) == 2L &&
      r.getLong(2) == 76L && r.getLong(3) == 1L, s"got $r")
  }

  // ---- q297 changepoint / q298 effective n ----------------------------

  test("changepoint: a clean level shift is found with full SSE gain") {
    val dir = tmp("graft_cp_")
    // Revs 1,1,1,5,5,5: total SSE 24, both segments constant → the
    // day-3 boundary removes all of it.
    writeEvents(dir, Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0).zipWithIndex.map {
      case (v, i) => (i.toLong, ts(f"2024-01-0${i + 1} 12:00:00"), 1L,
        "purchase", "{}", v) })
    val r = Queries.all("q297_changepoint_sse")(spark, dir).collect()(0)
    assert(r.getDate(0).toString == "2024-01-03" && r.getLong(1) == 3L &&
      r.getDouble(2) == 1.0 && r.getDouble(3) == 5.0 &&
      r.getDouble(4) == 24.0, s"got $r")
  }

  test("effective n: mirrored lag-covariance arithmetic on a square wave") {
    val dir = tmp("graft_ess_")
    // 12 days of 1,1,3,3 repeating — one purchase count per day is
    // forced by writing that many events per day.
    val xs = Seq(1, 1, 3, 3, 1, 1, 3, 3, 1, 1, 3, 3)
    writeEvents(dir, xs.zipWithIndex.flatMap { case (cnt, i) =>
      (0 until cnt).map(j => ((i * 10 + j).toLong,
        ts(f"2024-01-${i + 1}%02d 1$j:00:00"), 1L, "purchase", "{}", 1.0))
    })
    val n = xs.length; val mu = xs.sum.toDouble / n
    val d = xs.map(_ - mu)
    val den = d.map(v => v * v).sum
    val rho = (1 to 7).map(k =>
      (k until n).map(t => d(t) * d(t - k)).sum / den)
    def r(x: Double, sc: Int) =
      BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Queries.all("q298_effective_n")(spark, dir).collect()(0)
    assert(got.getLong(0) == n.toLong &&
      got.getDouble(1) == r(rho.sum, 6) &&
      got.getDouble(2) == r(n / (1.0 + 2.0 * rho.sum), 2), s"got $got")
  }

  // ---- q299 Cohen's kappa / q300 scorecard ----------------------------

  test("cohen kappa: hand-computed chance-corrected agreement") {
    val dir = tmp("graft_kappa_")
    // Stopword texts force the q21 heuristic: two en-labeled docs
    // predict en, one en-labeled doc reads German (miss), one
    // de-labeled doc predicts de → p_o = 3/4, marginals give
    // p_e = (3·2 + 1·2)/16 = 1/2 → kappa = 0.5.
    Seq(
      (1L, "the and of", "en", "s", 10L),
      (2L, "the and of", "en", "s", 10L),
      (3L, "der die das", "en", "s", 11L),
      (4L, "der die das", "de", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.all("q299_cohen_kappa")(spark, dir).collect()(0)
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.75 &&
      r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5, s"got $r")
  }

  test("corpus scorecard: counts, dup rate, and shares on a tiny corpus") {
    val dir = tmp("graft_score_")
    // Two identical docs (one exact dup) plus a third: 7 tokens,
    // 5 distinct words, dup rate 1/3, avg chars 11/3, en share 1/3.
    Seq(
      (1L, "a b", "en", "s", 3L),
      (2L, "a b", "de", "s", 3L),
      (3L, "c d e", "de", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r(x: Double, sc: Int) =
      BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g = Queries.all("q300_corpus_scorecard")(spark, dir).collect()(0)
    assert(g.getLong(0) == 3L && g.getLong(1) == 7L && g.getLong(2) == 5L &&
      g.getDouble(3) == r(1.0 / 3, 6) && g.getDouble(4) == r(11.0 / 3, 2) &&
      g.getDouble(5) == r(1.0 / 3, 6), s"got $g")
  }

  // ---- q264 skyline ---------------------------------------------------

  test("skyline: dominance with ties on both axes") {
    val dir = tmp("graft_sky_")
    // (key, price, date): o3 dominated same-price by o1/o2's later
    // date; o5 dominated by the cheaper-and-fresher o4; the o1/o2
    // duplicate point both survive (dominance needs a strict edge).
    Seq(
      (1L, 10.0, ts("2024-01-05 00:00:00")),
      (2L, 10.0, ts("2024-01-05 00:00:00")),
      (3L, 10.0, ts("2024-01-04 00:00:00")),
      (4L, 12.0, ts("2024-01-10 00:00:00")),
      (5L, 15.0, ts("2024-01-08 00:00:00")),
      (6L, 8.0, ts("2024-01-01 00:00:00")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Queries.all("q264_skyline")(spark, dir).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(6L, 1L, 2L, 4L), s"got ${got.toSeq}")

    // Cross-check against the O(n²) dominance definition on the same
    // input (the SQL-oracle formulation, evaluated independently).
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2)))
    val brute = o.filter { case (_, p, dt) =>
      !o.exists { case (_, p2, dt2) =>
        p2 <= p && !dt2.before(dt) && (p2 < p || dt2.after(dt)) }
    }.map(_._1).sorted
    assert(got.toSeq.sorted == brute.toSeq, s"brute=$brute")
  }
}
