package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE-style pre-tokenizer: lower-cased text → tokens under the
  * grammar `[a-z]+ | [0-9]+ | [^a-z0-9\s]` (letter runs, digit runs,
  * every other non-space as a single codepoint) as ONE codegen
  * expression — the scanner form of q229's regex.
  *
  * Why not `regexp_extract_all`: the alternation regex is correct but
  * runs the java.util.regex engine per row; measured cold at sf0.1 the
  * FIRST (pre-JIT) execution of that plan took ~100 s for a 5 000-doc
  * corpus (then 1.3 s warm) — a bench that executes every plan exactly
  * once pays the pre-JIT price every time, and a 100 TB corpus pays
  * the regex-engine constant forever. This scanner is a three-branch
  * character loop: no regex engine, no backtracking state, no empties,
  * same single-scan shape as [[TokensImpl]].
  *
  * Semantics are EXACTLY the regex form's (differential-tested against
  * `regexp_extract_all(lower(text), ..., 0)` over the full documents
  * corpus plus crafted unicode cases in TokensSpec):
  *   - lowercase via UTF8String.toLowerCase (identical to `lower`);
  *   - `\s` is Java-regex space = [ \t\n\x0B\f\r], NOT
  *     Character.isWhitespace (U+00A0 etc. are "other" tokens, as the
  *     regex treats them);
  *   - the "other" branch consumes ONE CODEPOINT (surrogate pairs stay
  *     whole, exactly as java.util.regex and RE2 match `.`-class
  *     singletons per codepoint, never per UTF-16 unit).
  *
  * Null text → null (standard UnaryExpression null handling).
  */
object PretokensImpl {

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def eval(text: UTF8String): GenericArrayData = {
    val s = text.toLowerCase.toString
    val len = s.length
    var out = new Array[AnyRef](8)
    var n = 0
    @inline def emit(st: Int, en: Int): Unit = {
      if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
      out(n) = UTF8String.fromString(s.substring(st, en))
      n += 1
    }
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (isSpace(c)) {
        i += 1
      } else if (c >= 'a' && c <= 'z') {
        val st = i
        while (i < len && { val x = s.charAt(i); x >= 'a' && x <= 'z' }) i += 1
        emit(st, i)
      } else if (c >= '0' && c <= '9') {
        val st = i
        while (i < len && { val x = s.charAt(i); x >= '0' && x <= '9' }) i += 1
        emit(st, i)
      } else {
        val w = if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1
        emit(i, i + w)
        i += w
      }
    }
    val trimmed = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    new GenericArrayData(trimmed.asInstanceOf[Array[Any]])
  }
}

case class Pretokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  // regexp_extract_all declares containsNull = false the same way
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_pretokens"

  override protected def nullSafeEval(input: Any): Any =
    PretokensImpl.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.expr.PretokensImpl.eval($text);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PretokenizeExpression {
  /** Column entry point: text → BPE-style pretokens. */
  def pretokens(text: Column): Column =
    bridge.column(Pretokens(bridge.expression(text)))
}
