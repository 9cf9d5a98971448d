package graft

import org.apache.spark.sql.functions._

/** The zero-cell audit of the contingency family, prompted by q313's
  * round-5 defect (chi-square summed over OBSERVED cells only, so an
  * empty cell's (0−E)²/E = E contribution silently vanished — and the
  * mirrored oracle hid it). Each test engineers a table with at least
  * one EMPTY cell and asserts the exact hand-computed statistic:
  *   - q126 must emit the empty cell (grid completion) with n=0 and
  *     contribution = expected;
  *   - q285's observed-cells MI is exact by the 0·log 0 = 0 limit —
  *     perfect association with empty off-diagonal cells gives
  *     MI = H(X) = H(Y) = log 2;
  *   - q220/q290 build their cells from conditional sums over the
  *     whole frame, so a zero cell is an explicit 0, not a missing
  *     row.
  */
class ContingencyAuditSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** events rows: (event_type, day "yyyy-MM-dd", user_id, n copies). */
  private def writeEvents(dir: String, cells: Seq[(String, String, Long, Int)]): Unit = {
    val rows = cells.zipWithIndex.flatMap { case ((et, day, uid, n), ci) =>
      (0 until n).map(i =>
        ((ci * 1000 + i).toLong, ts(s"$day 10:00:00"), uid, et, "{}", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q126 chisq: an empty (event_type, cohort) cell appears with n=0 and contribution = expected") {
    val dir = tmp("graft_chisq_")
    // Cohort = user_id % 3. Users 0 and 1 → cohorts 0 and 1.
    // A: 6 in cohort 0, 6 in cohort 1. B: 4 in cohort 0, NONE in
    // cohort 1 — the empty cell. Totals: r_A=12, r_B=4, c_0=10,
    // c_1=6, t=16.
    writeEvents(dir, Seq(
      ("A", "2024-03-04", 0L, 6), ("A", "2024-03-04", 1L, 6),
      ("B", "2024-03-04", 0L, 4)))
    val got = Queries.all("q126_chisq")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == 4, s"grid must be completed to 2x2, got ${got.keySet}")
    // Empty cell (B, cohort 1): E = 4*6/16 = 1.5, contrib = E.
    assert(got(("B", 1L)) == ((0L, 1.5, 1.5)), s"empty cell ${got(("B", 1L))}")
    // Spot-check an observed cell: (B, 0): E = 4*10/16 = 2.5,
    // contrib = (4-2.5)^2/2.5 = 0.9.
    assert(got(("B", 0L)) == ((4L, 2.5, 0.9)), s"(B,0) ${got(("B", 0L))}")
    // (A,0): E = 12*10/16 = 7.5, contrib = (6-7.5)^2/7.5 = 0.3.
    assert(got(("A", 0L)) == ((6L, 7.5, 0.3)), s"(A,0) ${got(("A", 0L))}")
    // (A,1): E = 12*6/16 = 4.5, contrib = (6-4.5)^2/4.5 = 0.5.
    assert(got(("A", 1L)) == ((6L, 4.5, 0.5)), s"(A,1) ${got(("A", 1L))}")
  }

  test("q285 MI: perfect association with empty off-diagonal cells gives MI = H(X) = H(Y) = ln 2") {
    val dir = tmp("graft_mi_")
    // A only on Monday, B only on Saturday, 8 each: the (A, Sat) and
    // (B, Mon) cells are EMPTY and contribute exactly 0 to the MI sum.
    writeEvents(dir, Seq(
      ("A", "2024-03-04", 0L, 8), ("B", "2024-03-09", 0L, 8)))
    val r = Queries.all("q285_mutual_information")(spark, dir).collect().head
    val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(0) == ln2, s"mi ${r.getDouble(0)} vs $ln2")
    assert(r.getDouble(1) == ln2 && r.getDouble(2) == ln2, r.toString)
  }

  test("q285 MI: exact independence gives 0 (all four cells observed)") {
    val dir = tmp("graft_mi0_")
    writeEvents(dir, Seq(
      ("A", "2024-03-04", 0L, 4), ("A", "2024-03-09", 0L, 4),
      ("B", "2024-03-04", 0L, 4), ("B", "2024-03-09", 0L, 4)))
    val r = Queries.all("q285_mutual_information")(spark, dir).collect().head
    assert(r.getDouble(0) == 0.0, s"independent MI must be 0, got ${r.getDouble(0)}")
  }

  test("q220 z-test: an arm with zero conversions is an explicit 0 cell, not a dropped row") {
    val dir = tmp("graft_ab_")
    // Users 0,2 (arm 0) both convert (value > 180); users 1,3 (arm 1)
    // never do — c1 = 0 must surface as the integer 0.
    val rows = Seq(
      (1L, ts("2024-01-02 10:00:00"), 0L, "purchase", "{}", 200.0),
      (2L, ts("2024-01-02 10:00:00"), 2L, "purchase", "{}", 250.0),
      (3L, ts("2024-01-02 10:00:00"), 1L, "purchase", "{}", 10.0),
      (4L, ts("2024-01-02 10:00:00"), 3L, "click", "{}", 5.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.all("q220_ab_test")(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, r.toString) // n0, c0
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L, r.toString) // n1, c1 = 0
    // z = (1 - 0) / sqrt(0.5*0.5*(1/2+1/2)) = 2.0
    assert(r.getDouble(6) == 2.0, s"z ${r.getDouble(6)}")
  }
}
