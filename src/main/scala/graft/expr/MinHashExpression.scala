package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd MinHash signature over a shingle array — the
  * second measured escape hatch (SURVEY §7.4): the composable
  * `transform(sequence(0,H-1), i -> array_min(transform(shingles, …)))`
  * runs interpreted (HOF lambdas are never code-generated) and
  * re-walks the shingle array once per hash function. This expression
  * hashes each shingle ONCE (xxhash64, same x86 XXH64 core as Spark's
  * builtin) and updates all H minima in a tight inner loop:
  * O(|shingles| · (hash + H mul-add)) per row, inside whole-stage
  * codegen.
  *
  * Signature semantics match [[graft.functions.TextFunctions.minhashSignature]]:
  * h_i(s) = ((xxhash64(s) mod P) · (2i+1) + i·982451653) mod P with
  * P = 2^31 − 1; empty input → all-P sentinel.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1
  private val Stride = 982451653L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h0 = XXH64.hashUTF8String(s, 42L) % P
        val h = if (h0 < 0) h0 + P else h0
        var j = 0
        while (j < numHashes) {
          val v = (h * (2L * j + 1L) + j * Stride) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${P}L);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final $utf8 $s = $arr.getUTF8String($i);
         |    long $h = $xxh.hashUTF8String($s, 42L) % ${P}L;
         |    if ($h < 0) $h += ${P}L;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $v = ($h * (2L * $j + 1L) + $j * ${Stride}L) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over PRE-hashed elements (array<long> of
  * xxhash64 codes, e.g. from [[ShingleHashes]]): computes exactly
  * [[MinHashSignature]]'s result — that expression's first step is
  * xxhash64 of each string, which the fused shingle pipeline has
  * already produced — without materializing the shingle-string array
  * at all. Same mul-add inner loop, same sentinel semantics.
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1
  private val Stride = 982451653L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_hashed"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // Null slots are skipped, matching MinHashSignature (reading a
      // null slot via getLong would yield an undefined value silently).
      if (!arr.isNullAt(i)) {
        val h0 = arr.getLong(i) % P
        val h = if (h0 < 0) h0 + P else h0
        var j = 0
        while (j < numHashes) {
          val v = (h * (2L * j + 1L) + j * Stride) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val gad = classOf[GenericArrayData].getName
      s"""
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${P}L);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i) % ${P}L;
         |    if ($h < 0) $h += ${P}L;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $v = ($h * (2L * $j + 1L) + $j * ${Stride}L) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpression {
  def minhash(shingles: Column, numHashes: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(shingles), numHashes))

  def minhashHashed(hashes: Column, numHashes: Int): Column =
    bridge.column(MinHashFromHashes(bridge.expression(hashes), numHashes))
}
