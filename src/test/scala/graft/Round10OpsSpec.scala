package graft

import org.apache.spark.sql.functions._

/** Construction-based ground truth for the q301-q304 additions: a
  * hand-computed two-clique modularity with duplicate edge evidence, a
  * hand-computed Benjamini-Hochberg readout over an engineered 10-doc
  * corpus, the EWMA chart mirrored in driver-side recursive arithmetic
  * (including the 60-day truncation), and the edit-distance join
  * checked both on a hand multiset corpus and against a brute-force
  * crossJoin differential (the losslessness claim of the prefix
  * filter).
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  // ---- q301 modularity -------------------------------------------------

  test("modularity: two 3-cliques bridged by one edge, duplicate co-occurrence counted once") {
    val dir = tmp("graft_mod_")
    // Orders encode edges; order 100 repeats a lineitem row and order
    // 107 repeats the whole {1,2} pair — the DISTINCT edge set must be
    // unaffected by either form of duplication.
    val li = Seq(
      (100L, 1L), (100L, 2L), (100L, 1L),
      (101L, 1L), (101L, 3L),
      (102L, 2L), (102L, 3L),
      (103L, 4L), (103L, 5L),
      (104L, 4L), (104L, 6L),
      (105L, 5L), (105L, 6L),
      (106L, 3L), (106L, 4L),
      (107L, 1L), (107L, 2L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"), (6L, "B"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Queries.all("q301_modularity")(spark, dir).collect()
    // m = 7 edges; each clique: m_c = 3, D_c = 7.
    // contribution = 3/7 - (7/14)^2 = 0.178571...; Q = 0.357142 after
    // the round-then-sum-then-round contract.
    assert(got.length == 2)
    val byComm = got.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byComm("A") == ((3L, 7L, 0.178571, 0.357142)), s"got ${byComm("A")}")
    assert(byComm("B") == ((3L, 7L, 0.178571, 0.357142)), s"got ${byComm("B")}")
  }

  // ---- q302 BH / FDR ---------------------------------------------------

  test("fdr bh: engineered 10-doc corpus — 2 BH = 2 Bonferroni rejections at cutoff chi2=10") {
    val dir = tmp("graft_bh_")
    // 5 en / 5 de docs. 'the' en-only (chi2=10), 'ein' de-only
    // (chi2=10), 'common' 3en/2de (chi2=0.4); u*/v* singletons fall
    // under the >=5-doc floor; no token spans all 10 docs.
    val docs = Seq(
      (1L, "the common u1", "en"), (2L, "the common u2", "en"),
      (3L, "the common u3", "en"), (4L, "the u4", "en"), (5L, "the u5", "en"),
      (6L, "ein common v1", "de"), (7L, "ein common v2", "de"),
      (8L, "ein v3", "de"), (9L, "ein v4", "de"), (10L, "ein v5", "de"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.all("q302_fdr_bh")(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    // m=3 tested; ranks: ein(10), the(10), common(0.4). BH thresholds
    // -2 ln(r*0.05/3): 8.19, 6.80, 5.99 -> k=2. Bonferroni 8.19 -> 2.
    assert(r.getLong(0) == 3L, s"m_tested ${r.getLong(0)}")
    assert(r.getLong(1) == 2L, s"n_bh ${r.getLong(1)}")
    assert(r.getLong(2) == 2L, s"n_bonferroni ${r.getLong(2)}")
    assert(r.getDouble(3) == 10.0, s"chi2_cutoff ${r.getDouble(3)}")
  }

  // ---- q303 EWMA chart -------------------------------------------------

  test("ewma chart: matches the driver-side recursive reference over 70 days (window truncation live)") {
    val dir = tmp("graft_ewma_")
    // 70 daily purchases (exercises the 60-day trailing truncation)
    // with a deterministic sawtooth plus one level shift.
    val xs = (0 until 70).map(i =>
      100.0 + 7.0 * (i % 5) + (if (i >= 50) 25.0 else 0.0))
    val rows = xs.zipWithIndex.map { case (v, i) =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(i.toLong)
      (i.toLong + 1, ts(s"$day 12:00:00"), 1L, "purchase", "{}", v)
    }
    (rows :+ ((999L, ts("2024-03-05 13:00:00"), 2L, "click", "{}", 1e6)))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Queries.all("q303_ewma_chart")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.length == 70)

    // Driver-side reference: normalized trailing-60 EWMA with
    // lambda-bar = 1/2; in-control mu0/sd0 from the 30-day burn-in.
    val revs = xs // one purchase per day, round(sum,2) = value
    val burn = revs.take(30)
    val mu0 = burn.sum / burn.length
    val sd0 = math.sqrt(burn.map(v => (v - mu0) * (v - mu0)).sum / (burn.length - 1))
    got.zipWithIndex.foreach { case ((_, rev, ewma, ucl, lcl, flag), t) =>
      assert(rev == revs(t))
      val lo = math.max(0, t - 59)
      val ws = (lo to t).map(k => math.pow(0.5, t - k))
      val num = (lo to t).map(k => revs(k) * math.pow(0.5, t - k)).sum
      val den = ws.sum
      val varf = ws.map(w => w * w).sum / (den * den)
      val expEwma = num / den
      val hw = 3.0 * sd0 * math.sqrt(varf)
      assert(math.abs(ewma - expEwma) < 5e-4, s"day $t ewma $ewma vs $expEwma")
      assert(math.abs(ucl - (mu0 + hw)) < 5e-4, s"day $t ucl")
      assert(math.abs(lcl - (mu0 - hw)) < 5e-4, s"day $t lcl")
      assert(flag == (expEwma > mu0 + hw || expEwma < mu0 - hw), s"day $t flag")
    }
    // The level shift at day 50 must eventually trip the upper limit.
    assert(got.drop(50).exists(_._6), "expected an out-of-control day after the level shift")
  }

  test("ewma chart: a multi-year series stays finite (absolute 2^day_idx weights would NaN past day 1024)") {
    val dir = tmp("graft_ewma_long_")
    // 31 daily points for the burn-in, then isolated purchases every
    // 100 days out to day 3000: day_idx reaches 3000, where absolute
    // pow(2, day_idx)/pow(4, day_idx) weighting overflows to Infinity
    // and turns every late ewma/ucl/lcl into NaN/null. Window-relative
    // exponents keep all weights in [2^-59, 1].
    val days = (0 until 31) ++ (1 to 30).map(_ * 100)
    val rows = days.zipWithIndex.map { case (d, i) =>
      val day = java.time.LocalDate.of(2021, 1, 1).plusDays(d.toLong)
      (i.toLong + 1, ts(s"$day 12:00:00"), 1L, "purchase", "{}", 100.0 + (d % 7))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.all("q303_ewma_chart")(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == days.length)
    got.foreach { case (rev, ewma, ucl, lcl) =>
      assert(!ewma.isNaN && !ucl.isNaN && !lcl.isNaN, s"NaN control stats at rev $rev")
    }
    // An isolated day (gap > 59) is its own whole frame: ewma == rev.
    got.drop(31).foreach { case (rev, ewma, _, _) =>
      assert(ewma == rev, s"isolated day must have ewma == rev, got $ewma vs $rev")
    }
  }

  // ---- q304 edit join --------------------------------------------------

  test("edit join: hand multiset corpus — within-group C(m,2) and cross-group m_a*m_b counts") {
    val dir = tmp("graft_ed_")
    val names =
      Seq.fill(3)("aaaa bolt") ++ Seq.fill(2)("aaab bolt") ++
        Seq("aabb bolt", "cccc ring")
    names.toDF("p_name").write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Queries.all("q304_edit_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dist 0: C(3,2) + C(2,2-ish)=1 -> 4. dist 1: aaaa~aaab 3*2 plus
    // aaab~aabb 2*1 -> 8. dist 2: aaaa~aabb 3*1 -> 3. 'cccc ring' is
    // beyond d=2 from everything.
    assert(got == Map(0L -> 4L, 1L -> 8L, 2L -> 3L), s"got $got")
  }

  test("edit join: lossless vs brute force on a varied corpus") {
    val dir = tmp("graft_ed2_")
    // Mixed-length names engineered so some within-distance pairs share
    // only RARE grams (the prefix filter's burden) and some share none
    // of the frequent head grams.
    val base = Seq(
      "alpha beam", "alpha beams", "alpho beam", "alpha bean",
      "gamma coil", "gamma coils", "gamno coil",
      "delta ring", "delta rung", "delte ring",
      "omega bolt", "omega bolts", "omegas bolt",
      "zeta pump", "zeta pumps", "zeto pump", "unique widget")
    val names = base ++ base.take(5) // duplicates to exercise multiplicity
    names.toDF("p_name").write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Queries.all("q304_edit_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Brute force over ROW pairs (ids = positions).
    val idx = names.zipWithIndex
    val brute = (for {
      (a, i) <- idx; (b, j) <- idx if i < j
      d = levDist(a, b) if d <= 2
    } yield d).groupBy(identity).map { case (k, v) => k.toLong -> v.size.toLong }
    assert(got == brute, s"got $got want $brute")
  }

  // ---- q313 Cramér's V -------------------------------------------------

  test("cramers v: perfect 2x2 association gives V = 1 (raw and bias-corrected); independence gives 0") {
    def write(dir: String, cells: Seq[(String, String, Int)]): Unit = {
      val rows = cells.zipWithIndex.flatMap { case ((et, day, n), ci) =>
        (0 until n).map(i =>
          ((ci * 100 + i).toLong, ts(s"$day 10:00:00"), 1L, et, "{}", 1.0))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val d1 = tmp("graft_cv1_")
    // A only on Monday, B only on Saturday — perfect association.
    write(d1, Seq(("A", "2024-03-04", 10), ("B", "2024-03-09", 10)))
    val r1 = Queries.all("q313_cramers_v")(spark, d1).collect().head
    assert(r1.getLong(0) == 20L && r1.getDouble(3) == 20.0)
    assert(r1.getDouble(4) == 1.0 && r1.getDouble(5) == 1.0, r1.toString)

    val d2 = tmp("graft_cv2_")
    // Identical 5/5 split on both days — exact independence.
    write(d2, Seq(("A", "2024-03-04", 5), ("A", "2024-03-09", 5),
      ("B", "2024-03-04", 5), ("B", "2024-03-09", 5)))
    val r2 = Queries.all("q313_cramers_v")(spark, d2).collect().head
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.0,
      r2.toString)
  }

  // ---- q315 nearest-event join -----------------------------------------

  test("nearest join: equidistant ties go backward; one-sided and matchless users are exact") {
    val dir = tmp("graft_nj_")
    def ev(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, "{}", 1.0)
    Seq(
      // user 1: purchases 10:00 and 10:20, click 10:10 — EQUIDISTANT → backward (id 100).
      ev(100, "2024-01-01 10:00:00", 1, "purchase"),
      ev(1, "2024-01-01 10:10:00", 1, "click"),
      ev(101, "2024-01-01 10:20:00", 1, "purchase"),
      // user 2: only a LATER purchase → forward.
      ev(2, "2024-01-01 09:00:00", 2, "click"),
      ev(200, "2024-01-01 11:00:00", 2, "purchase"),
      // user 3: only an EARLIER purchase → backward.
      ev(300, "2024-01-01 08:00:00", 3, "purchase"),
      ev(3, "2024-01-01 09:30:00", 3, "click"),
      // user 4: no purchases → none sentinel.
      ev(4, "2024-01-01 12:00:00", 4, "click"),
      // user 5: CLOSER forward than backward → forward wins.
      ev(500, "2024-01-01 10:00:00", 5, "purchase"),
      ev(5, "2024-01-01 10:30:00", 5, "click"),
      ev(501, "2024-01-01 10:40:00", 5, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.all("q315_nearest_event_join")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(got(1L) == ((100L, 600000000L, "back")), s"tie must go backward: ${got(1L)}")
    assert(got(2L) == ((200L, 7200000000L, "fwd")), got(2L).toString)
    assert(got(3L) == ((300L, 5400000000L, "back")), got(3L).toString)
    assert(got(4L) == ((-1L, -1L, "none")), got(4L).toString)
    assert(got(5L) == ((501L, 600000000L, "fwd")), got(5L).toString)
  }

  // ---- q310 Simpson audit / q311 power planner -------------------------

  test("simpson audit: engineered composition effect — both strata slope -1, pooled +0.980198") {
    val dir = tmp("graft_sa_")
    val li = Seq(
      ("A", 0.0, 10.0), ("A", 1.0, 9.0),
      ("B", 10.0, 20.0), ("B", 11.0, 19.0))
    li.toDF("l_returnflag", "l_discount", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.all("q310_simpson_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got("A") == ((-1.0, 0.980198, true)), s"A ${got("A")}")
    assert(got("B") == ((-1.0, 0.980198, true)), s"B ${got("B")}")
  }

  test("abtest power: hand moments — values 1..5 need 1743 per arm at 5% lift") {
    val dir = tmp("graft_pw_")
    val rows = (1 to 5).map(i =>
      (i.toLong, ts(s"2024-03-0$i 10:00:00"), 1L, "purchase", "{}", i.toDouble))
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.all("q311_abtest_power")(spark, dir).collect().head
    // mu=3, s2=2.5: n = ceil(2.8^2 * 2 * 2.5 / 0.15^2) = ceil(1742.22) = 1743
    assert(r.getString(0) == "purchase" && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 1.5811)
    assert(r.getLong(4) == 1743L, s"n_per_arm ${r.getLong(4)}")
  }

  // ---- q309 component sizes --------------------------------------------

  test("component sizes: triple cluster, pair cluster, and singletons land in the right bins") {
    val dir = tmp("graft_cs_")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta epsilon", "en"),
      (3L, "alpha beta gamma delta epsilon", "en"),
      (4L, "one two three four five six", "en"),
      (5L, "one two three four five seven", "en"), // Jaccard 3/5 with doc 4
      (6L, "xx yy zz aa bb", "en"),
      (7L, "mm nn oo pp qq", "en"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.all("q309_component_sizes")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L), s"got $got")
  }

  // ---- q308 Kruskal-Wallis ---------------------------------------------

  test("kruskal-wallis: hand-computed H with a cross-group tie and tie correction") {
    val dir = tmp("graft_kw_")
    // Monday (2024-03-04) values [1,1,2]; Saturday (2024-03-09) [2,3].
    // Tied avg ranks: 1.5,1.5,3.5 | 3.5,5 -> R_A=6.5, R_B=8.5, N=5.
    // H = 12/30*(6.5^2/3 + 8.5^2/2) - 18 = 2.083333;
    // tie3 = 6+6 -> correction 1 - 12/120 = 0.9 -> H' = 2.314815.
    val rows = Seq(
      (1L, ts("2024-03-04 10:00:00"), 1L, "purchase", "{}", 1.0),
      (2L, ts("2024-03-04 11:00:00"), 1L, "purchase", "{}", 1.0),
      (3L, ts("2024-03-04 12:00:00"), 1L, "purchase", "{}", 2.0),
      (4L, ts("2024-03-09 10:00:00"), 2L, "purchase", "{}", 2.0),
      (5L, ts("2024-03-09 11:00:00"), 2L, "purchase", "{}", 3.0),
      (6L, ts("2024-03-09 12:00:00"), 2L, "click", "{}", 99.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.all("q308_kruskal_wallis")(spark, dir).collect()
    assert(got.length == 2)
    val mon = got.find(_.getLong(0) == 2L).get // Spark dayofweek: Monday=2
    val sat = got.find(_.getLong(0) == 7L).get
    assert(mon.getLong(1) == 3L && mon.getDouble(2) == 2.1667, mon.toString)
    assert(sat.getLong(1) == 2L && sat.getDouble(2) == 4.25, sat.toString)
    assert(mon.getLong(3) == 5L)
    assert(mon.getDouble(4) == 2.0833, s"h ${mon.getDouble(4)}")
    assert(mon.getDouble(5) == 2.3148, s"h' ${mon.getDouble(5)}")
  }

  // ---- q307 blocking quality -------------------------------------------

  test("blocking quality: matches a brute-force RR/PC reference; the far-apart near-dup is the miss") {
    val dir = tmp("graft_bq_")
    // 'zlpha beam' is 1 edit from 'alpha beam' but sorts 7 ranks away —
    // engineered to FALL OUT of the window-5 block.
    val names = Seq("alpha beam", "alpha bean",
      "b0001", "b0002", "b0003", "b0004", "b0005", "b0006", "zlpha beam")
    names.toDF("p_name").write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Queries.all("q307_blocking_quality")(spark, dir).collect().head

    // Brute-force reference at the same grain.
    val sorted = names.sorted
    val idx = sorted.zipWithIndex
    val truth = for {
      (a, i) <- idx; (b, j) <- idx if i < j && levDist(a, b) <= 2
    } yield (a, b)
    val cand = for {
      (a, i) <- idx; (b, j) <- idx if j > i && j <= i + 5
    } yield (a, b)
    val caught = truth.toSet.intersect(cand.toSet)
    assert(r.getLong(0) == names.length.toLong)
    assert(r.getLong(1) == truth.size.toLong, s"truth ${r.getLong(1)} want ${truth.size}")
    assert(r.getLong(2) == cand.size.toLong)
    assert(r.getLong(3) == caught.size.toLong)
    val n = names.length
    assert(r.getDouble(4) ==
      BigDecimal(1.0 - cand.size / (n * (n - 1) / 2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(5) ==
      BigDecimal(caught.size.toDouble / truth.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // The engineered long-range pairs are exactly the misses.
    val missed = truth.toSet -- caught
    assert(missed == Set(("alpha beam", "zlpha beam"), ("alpha bean", "zlpha beam")),
      s"missed $missed")
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  // ---- q325 n-gram perplexity -----------------------------------------

  test("ngram perplexity: hand-computed stupid backoff over a 4-doc corpus") {
    val dir = tmp("graft_ppl_")
    // Train (even ids): doc0 "a b a b" -> (a,b):2 (b,a):1; doc2 "a b c"
    // -> (a,b):1 (b,c):1. Bigrams: (a,b)=3 (b,a)=1 (b,c)=1; unigrams
    // a=3 b=3 c=1, N=7, V=3. Held-out doc1 "a b z": (a,b) seen ->
    // ln(3/3)=0; (b,z) unseen, z OOV -> ln(0.4)+ln(0.5/8.5)
    // = -3.749504075930...; nll = 3.7495.../2 = 1.8748 (4 dp).
    // doc3 is single-token: zero bigrams, must drop out (and must not
    // blow up the slice arithmetic).
    val docs = Seq(
      (0L, "a b a b", "en"), (1L, "a b z", "en"),
      (2L, "a b c", "en"), (3L, "x", "en"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.all("q325_ngram_perplexity")(spark, dir).collect()
    assert(got.length == 1, s"only doc 1 is scoreable: ${got.mkString(";")}")
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(2) == 2L, r.toString)
    assert(r.getDouble(3) == 1.8748, s"nll ${r.getDouble(3)}")
  }

  test("perplexity buckets: per-language terciles are balanced and ordered") {
    val rows = Queries.all("q326_perplexity_buckets")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val byB = bs.sortBy(_._2)
      // exact ntile: bucket sizes differ by at most 1
      val ns = byB.map(_._3)
      assert(ns.max - ns.min <= 1, s"$lang unbalanced: ${ns.mkString(",")}")
      // nll envelopes are non-overlapping in bucket order (ties allowed)
      byB.sliding(2).foreach {
        case Array(a, b) =>
          // a tie spanning the boundary makes them equal, never inverted
          assert(a._5 <= b._4,
            s"$lang: ${a._2} max ${a._5} vs ${b._2} min ${b._4}")
        case _ => ()
      }
    }
  }
}
