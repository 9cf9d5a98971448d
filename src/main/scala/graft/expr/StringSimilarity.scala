package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler string similarity.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler, which is the standard
  * scorer for short-name entity resolution (it weights shared prefixes,
  * where human-entered identifiers agree first). Implemented as a
  * native `BinaryExpression` so the quadratic blocked-match stage stays
  * inside whole-stage codegen — the same measured escape hatch as
  * [[DotProduct]] (SURVEY §7.4): one static call per row, no row
  * boxing, no interpreted HOF fallback.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (verified
  * empirically against duckdb 1.x on classic fixture pairs — see
  * StringSimilaritySpec): classic Jaro with match window
  * `max(|a|,|b|)/2 - 1`; Winkler prefix boost `J + l·0.1·(1−J)` with
  * prefix length capped at 4, applied only when J > 0.7; either side
  * empty (or both) → 0.0. Comparison is per Java char — identical to
  * per-codepoint for the ASCII fixtures, and consistent across engines
  * for any BMP text.
  */
object JaroWinklerImpl {

  /** Codegen entry point (UTF8String → UTF8String → double). */
  def similarity(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      val cap = math.min(4, math.min(s1.length, s2.length))
      var l = 0
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  def jaro(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!m2(k) && s1.charAt(i) == s2.charAt(k)) {
          m1(i) = true; m2(k) = true; matches += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Half-transpositions: matched chars compared in match order.
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / n1 + m / n2 + (m - t / 2.0) / m) / 3.0
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.JaroWinklerImpl.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column-level entry point: `jaroWinkler(a, b)` over two string
    * columns, 0.0–1.0 (1.0 = equal, per the DuckDB-compatible contract
    * above).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(a), bridge.expression(b)))
}
