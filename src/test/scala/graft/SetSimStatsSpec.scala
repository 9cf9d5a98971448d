package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Concurrency, SetSimJoin, Stats}

/** Construction-based ground truth for the round-3b operators:
  * prefix-filtered set-similarity join (q106), Spearman rank
  * correlation (q103), and distributed peak concurrency (q111).
  */
class SetSimStatsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteJaccardPairs(
      docs: Seq[(Long, Seq[String])],
      theta: Double): Set[(Long, Long)] = {
    val sets = docs.map { case (id, els) => id -> els.toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= theta
    } yield (ia, ib)).toSet
  }

  test("prefix jaccard join == brute force on planted near-dups") {
    // three near-dup clusters + unrelated docs, shared stop-ish tokens
    val docs: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("the", "quick", "brown", "fox", "jumps"),
      2L -> Seq("the", "quick", "brown", "fox", "leaps"),      // ~0.67 vs 1
      3L -> Seq("the", "quick", "brown", "fox", "jumps", "hi"), // ~0.83 vs 1
      4L -> Seq("entirely", "different", "tokens", "here"),
      5L -> Seq("entirely", "different", "tokens", "there"),    // 0.6 vs 4
      6L -> Seq("the", "lone", "wolf"),
      7L -> Seq("singleton"))
    val df = docs.toDF("id", "els")
    for (theta <- Seq(0.5, 0.6, 0.8)) {
      val got = SetSimJoin.prefixJaccardSelfJoin(df, "id", "els", theta)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccardPairs(docs, theta), s"theta=$theta")
    }
  }

  test("prefix jaccard join: duplicate elements collapse to set semantics") {
    val df = Seq(
      (1L, Seq("a", "a", "b", "b")),  // set {a,b}
      (2L, Seq("b", "a"))).toDF("id", "els")
    val got = SetSimJoin.prefixJaccardSelfJoin(df, "id", "els", 0.9)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("q106 prefix join finds exactly the pairs the q23 LSH path verifies") {
    val dir = "/root/testdata/sf0.001"
    val exact = Queries.q106_setsim_prefix(spark, dir)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = Queries.q23_dedup_minhash(spark, dir)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // the LSH path can only MISS pairs, never invent them — and the
    // exact path must dominate it
    assert(lsh.subsetOf(exact))
    assert(exact == lsh, "128-hash/32-band LSH should have full recall here")
  }

  test("spearman: monotone → 1, antitone → -1, hand-computed ties") {
    val mono = Seq(("g", 1.0, 10.0), ("g", 2.0, 20.0), ("g", 3.0, 25.0),
      ("h", 1.0, 5.0), ("h", 2.0, 4.0), ("h", 3.0, 1.0))
      .toDF("grp", "x", "y")
    val got = Stats.spearmanByGroup(mono, "grp", "x", "y")
      .select("grp", "spearman").as[(String, Double)].collect().toMap
    assert(got("g") == 1.0 && got("h") == -1.0)
    // x = [1,1,2] → avg ranks [1.5,1.5,3]; y strictly increasing →
    // [1,2,3]; Pearson of those = 0.75/sqrt(0.75) ≈ 0.8660
    val ties = Seq(("t", 1.0, 10.0), ("t", 1.0, 20.0), ("t", 2.0, 30.0))
      .toDF("grp", "x", "y")
    val rho = Stats.spearmanByGroup(ties, "grp", "x", "y")
      .select("spearman").as[Double].head()
    assert(rho == 0.866)
  }

  test("spearman: forced distributed path == per-group window fallback (incl. ties)") {
    // The cost-based fallback (small inputs → per-group windows) and
    // the scale path (distributed two-pass composite rank) must agree
    // exactly; lineitem quantities are heavily tied, so this exercises
    // the tie-averaging of both forms.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val viaWindow = Stats.spearmanByGroup(
        li, "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag").collect().toSeq
    val viaDistributed = Stats.spearmanByGroup(
        li, "l_returnflag", "l_quantity", "l_extendedprice", smallInputBytes = 0L)
      .orderBy("l_returnflag").collect().toSeq
    assert(viaWindow.nonEmpty && viaWindow == viaDistributed)
  }

  test("peak concurrency matches brute-force sweep incl. midnight crossing") {
    val base = Timestamp.valueOf("2024-03-01 23:50:00").getTime
    def ts(offsetSec: Long) = new Timestamp(base + offsetSec * 1000)
    // k1: three sessions overlapping at 23:55–23:58ish, one of which
    // spans midnight; a fourth starts next day inside the carried-over
    // window. k2: two disjoint sessions (peak 1).
    val events = Seq(
      ("k1", ts(0)),     // 23:50–23:55
      ("k1", ts(120)),   // 23:52–23:57
      ("k1", ts(540)),   // 23:59–00:04 (+1 day)
      ("k1", ts(660)),   // 00:01–00:06 — overlaps the midnight session
      ("k2", ts(0)),
      ("k2", ts(600))).toDF("k", "ts")
    // brute force: concurrency at each start instant (peaks occur at
    // starts for half-open intervals)
    val iv = events.as[(String, Timestamp)].collect()
      .map { case (k, t0) => (k, t0.getTime, t0.getTime + 300000L) }
    val want = iv.groupBy(_._1).map { case (k, is) =>
      k -> is.map { case (_, s, _) =>
        is.count { case (_, s2, e2) => s2 <= s && s < e2 }
      }.max
    }
    val got = Concurrency.peakConcurrent(events, "k", "ts", 300L)
      .select(col("k"), col("peak_concurrent").cast("int"), col("n_sessions").cast("int"))
      .as[(String, Int, Int)].collect()
      .map { case (k, p, n) => k -> ((p, n)) }.toMap
    assert(got("k1")._1 == want("k1") && got("k2")._1 == want("k2"))
    assert(got("k1")._2 == 4 && got("k2")._2 == 2)
    // the midnight-spanning overlap is the point: day-partitioned
    // running sums alone would reset the count at 00:00
    assert(got("k1")._1 == 2)
  }

  test("back-to-back half-open intervals never overlap") {
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    val t1 = Timestamp.valueOf("2024-03-01 10:05:00") // starts exactly at end
    val df = Seq(("k", t0), ("k", t1)).toDF("k", "ts")
    val peak = Concurrency.peakConcurrent(df, "k", "ts", 300L)
      .select(col("peak_concurrent").cast("int")).as[Int].head()
    assert(peak == 1)
  }
}
