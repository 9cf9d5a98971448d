package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text → lower-cased whitespace-token array as ONE codegen
  * expression (the tokenizer behind `TextFunctions.tokens`).
  *
  * The composable form `filter(split(lower(text), "\\s+"), t => t =!=
  * "")` pays three per-row costs this fuses away: a full-document
  * lower-cased copy, a Java-regex split (allocating a String[] plus a
  * UTF8String per element INCLUDING the empties), and an interpreted
  * HOF `filter` pass (Spark never code-generates lambda bodies).
  * `tokens` sits under most of the text-analysis surface (q07 word
  * count, q21 language/quality, q22 token counts, TF-IDF/BM25, bigram
  * LM, stemming, lexical diversity), so the per-row constant matters
  * at 100 TB: this is one scan with no regex engine and no
  * intermediate empties, same shape as [[ShingleHashesImpl]].
  *
  * Semantics are EXACTLY the composable form's (differential-tested in
  * TokensSpec over the full documents table):
  *   - lowercasing via UTF8String.toLowerCase (what Spark's `lower`
  *     does) — applied to the whole string BEFORE boundary scanning,
  *     so even a pathological case-mapping that changed length could
  *     not diverge from `split(lower(text))`;
  *   - separators: runs of Java-regex `\s` = [ \t\n\x0B\f\r] —
  *     deliberately NOT Character.isWhitespace (unicode spaces stay
  *     inside tokens, as `split` keeps them);
  *   - empties dropped (split's leading-empty artifact and the HOF
  *     filter both disappear: the scan only ever emits non-empty runs).
  *
  * Null text → null (standard UnaryExpression null handling).
  */
object TokensImpl {

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def eval(text: UTF8String): GenericArrayData = {
    val s = text.toLowerCase.toString
    val len = s.length
    var out = new Array[AnyRef](8)
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = UTF8String.fromString(s.substring(st, i))
        n += 1
      }
    }
    val trimmed = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    new GenericArrayData(trimmed.asInstanceOf[Array[Any]])
  }
}

case class Tokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  // containsNull = false matches the composable filter(split(lower(...)))
  // form EXACTLY: Spark's StringSplit itself declares
  // ArrayType(StringType, containsNull = false) and ArrayFilter
  // preserves it, so schema-sensitive consumers (unionByName of the two
  // forms, strict writers, schema-equality asserts) see the same type
  // from either. Pinned by TokensSpec's schema-parity test.
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokensImpl.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.expr.TokensImpl.eval($text);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeExpression {
  /** Column entry point: text → lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    bridge.column(Tokens(bridge.expression(text)))
}
