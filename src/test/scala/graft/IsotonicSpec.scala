package graft

import org.apache.spark.sql.functions._

/** operators/Isotonic pinned on the classic PAVA cases — the minimax
  * form must reproduce exactly what the sequential pool loop would.
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(bins: Seq[(Long, Long, Long)]): Map[Long, Double] =
    graft.operators.Isotonic.fit(bins.toDF("bin", "n", "sy"), "bin", "n", "sy")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("already-monotone rates pass through unchanged") {
    // rates 0.1, 0.2, 0.5, 0.9 with equal weight
    val got = fit(Seq((0L, 10L, 1L), (1L, 10L, 2L), (2L, 10L, 5L), (3L, 10L, 9L)))
    assert(got == Map(0L -> 0.1, 1L -> 0.2, 2L -> 0.5, 3L -> 0.9), got.toString)
  }

  test("one violation pools its adjacent pair to the pair average") {
    // rates 0.1, 0.5, 0.3, 0.7 → bins 1,2 pool to 0.4
    val got = fit(Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 3L), (3L, 10L, 7L)))
    assert(got == Map(0L -> 0.1, 1L -> 0.4, 2L -> 0.4, 3L -> 0.7), got.toString)
  }

  test("cascading violation pools three bins; weights matter") {
    // rates 0.9, 0.5, 0.1 with weights 10, 10, 20: the whole frame
    // pools to (9+5+2)/40 = 0.4 (a decreasing sequence is one pool)
    val got = fit(Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 20L, 2L)))
    assert(got == Map(0L -> 0.4, 1L -> 0.4, 2L -> 0.4), got.toString)
  }

  test("partial pool respects the weighted average, not the midpoint") {
    // rates 0.2, 0.8 (n=30), 0.4 (n=10) → bins 1,2 pool to
    // (24+4)/40 = 0.7, still above bin 0 → fit 0.2, 0.7, 0.7
    val got = fit(Seq((0L, 10L, 2L), (1L, 30L, 24L), (2L, 10L, 4L)))
    assert(got == Map(0L -> 0.2, 1L -> 0.7, 2L -> 0.7), got.toString)
  }

  test("fit is monotone non-decreasing on a random-ish frame") {
    val bins = Seq((0L, 7L, 5L), (1L, 13L, 2L), (2L, 5L, 4L), (3L, 11L, 3L),
      (4L, 9L, 8L), (5L, 6L, 1L))
    val got = fit(bins).toSeq.sortBy(_._1).map(_._2)
    assert(got.sliding(2).forall(p => p.head <= p.last), got.toString)
  }
}
