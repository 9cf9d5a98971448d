package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text → shingle-hash-set pipeline as ONE codegen expression —
  * the third measured escape hatch (SURVEY §7.4).
  *
  * The composable form
  * `sort_array(array_distinct(transform(wordShingles(tokens(text), n),
  * xxhash64)))` stacks four higher-order functions, and Spark NEVER
  * code-generates HOF lambdas: each layer evaluates interpreted,
  * re-boxing and re-materializing an intermediate array per row
  * (tokens → shingle strings → hashes → distinct → sorted). Profiled
  * at sf0.1 that interpreted tower was ~6s of q106's ~8s — more than
  * the candidate join and verify combined. This expression does one
  * pass per row inside whole-stage codegen: tokenize, roll an n-token
  * window, hash each shingle once, sort+dedup primitive longs.
  *
  * Semantics are EXACTLY the composable form's (differential-tested in
  * Round5OpsSpec over the full documents table):
  *   - tokens: `split(lower(text), "\\s+")` with empties dropped —
  *     lowercasing via UTF8String.toLowerCase (what Spark's `lower`
  *     does), separators = runs of Java-regex `\s` chars;
  *   - shingles: n consecutive tokens joined by a single space;
  *   - hash: XXH64 of the shingle's UTF-8 bytes, seed 42 (what
  *     `xxhash64(shingle)` computes);
  *   - result: ascending, duplicates collapsed (set semantics).
  *
  * Null text → null (standard UnaryExpression null handling); fewer
  * than n tokens → empty array.
  */
object ShingleHashesImpl {

  /** Java-regex `\s` — deliberately NOT Character.isWhitespace, which
    * accepts unicode spaces that `split(_, "\\s+")` would keep inside
    * tokens.
    */
  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Positional form: hash of the n-token window STARTING AT EACH
    * TOKEN POSITION, in order, duplicates kept — element index IS the
    * window's token offset, which is what span-level duplicate
    * detection needs (DupSpans merges runs of consecutive matching
    * positions; a set would erase the geometry).
    */
  def evalPositional(text: UTF8String, n: Int): GenericArrayData = {
    val hashed = rawWindowHashes(text, n)
    new GenericArrayData(hashed)
  }

  def eval(text: UTF8String, n: Int): GenericArrayData = {
    val out = rawWindowHashes(text, n)
    if (out.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    java.util.Arrays.sort(out)
    // In-place dedup of the sorted longs.
    var uniq = 1
    var k = 1
    while (k < out.length) {
      if (out(k) != out(uniq - 1)) { out(uniq) = out(k); uniq += 1 }
      k += 1
    }
    new GenericArrayData(
      if (uniq == out.length) out else java.util.Arrays.copyOf(out, uniq))
  }

  /** One fused pass: tokenize + roll the n-window + hash, positional
    * order, duplicates kept. Shared by the set form (which sorts and
    * dedups after) and the positional form (which returns it as-is).
    */
  private def rawWindowHashes(text: UTF8String, n: Int): Array[Long] = {
    val s = text.toLowerCase.toString
    val len = s.length
    // Token boundaries (start/end char offsets), empties dropped.
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      }
    }
    if (nTok < n) return Array.emptyLongArray
    val out = new Array[Long](nTok - n + 1)
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w <= nTok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(w + j), ends(w + j))
        j += 1
      }
      out(w) = XXH64.hashUTF8String(
        UTF8String.fromString(sb.toString), 42L)
      w += 1
    }
    out
  }
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashesImpl.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.expr.ShingleHashesImpl.eval($text, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PositionalShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_positional_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashesImpl.evalPositional(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.expr.ShingleHashesImpl.evalPositional($text, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpression {
  /** Column entry point: text → sorted distinct xxhash64 codes of its
    * word n-shingles.
    */
  def shingleHashes(text: Column, n: Int): Column =
    bridge.column(ShingleHashes(bridge.expression(text), n))

  /** text → xxhash64 codes of its word n-shingles IN POSITION ORDER
    * (index = starting token offset, duplicates kept).
    */
  def positionalShingleHashes(text: Column, n: Int): Column =
    bridge.column(PositionalShingleHashes(bridge.expression(text), n))
}
