package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` — the §7.4
  * extension surface the engine had not yet exercised (custom
  * Expressions and SparkPlans exist; this is the typed-UDAF leg).
  *
  * Semantics: keep the k largest (score, id) pairs, ordered score
  * DESC then id ASC (the id tiebreak makes the result engine- and
  * partitioning-deterministic). State is O(k) per group at every
  * stage — partial buffers trim to k before they shuffle, so a group
  * with a billion rows still ships k tuples — the same bounded-state
  * argument as the WindowGroupLimit path (q63/q76), here available as
  * an AGGREGATE so it composes with other aggs in one pass and never
  * needs a sort of the group.
  *
  * The k values here are small (report top-N); reduce/merge use
  * sort-and-trim over ≤ 2k elements rather than a heap — at k beyond
  * ~10³ switch the buffer to a bounded priority queue.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, "k must be >= 1")

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    trim(b :+ a)
  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(r)
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
