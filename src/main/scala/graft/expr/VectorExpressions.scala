package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * Why a custom Catalyst Expression (SURVEY §7.4's measured escape
  * hatch): the composable form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` runs INTERPRETED — Spark
  * does not code-generate higher-order-function lambdas — and it
  * materializes the zipped intermediate array per row. For the
  * quadratic near-dup join (12.5M pairs × 64 dims at sf0.1) that
  * interpretation overhead dominated the whole benchmark. This
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen: no intermediate array, no per-element virtual calls.
  *
  * Semantics: sum over the common prefix length of a[i]*b[i]. Null
  * arrays propagate null (standard BinaryExpression null handling);
  * null ELEMENTS read as 0.0 (our vectors never contain them).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Argmax-dot cell assignment of a unit vector against a FIXED
  * centroid matrix (the IVF coarse quantizer's inner loop).
  *
  * Why not `greatest(struct(dot(nv, lit(c1)), cid1), ...)`: that form
  * UNROLLS k×d literal doubles into the generated source — at k=16,
  * d=64 that is >1k inline constants, recompiled for every distinct
  * centroid set (each Lloyd round and the final assign carry different
  * literals), and janino compile time dominated q34's profile. Here the
  * matrix rides along as a codegen REFERENCE OBJECT: the generated code
  * is one constant-size static call whatever k×d is, and the scan is a
  * tight primitive loop with no per-centroid struct allocation.
  *
  * Tie/NaN contract matches the struct-ordering form it replaced: max
  * over (sim, cid) lexicographic with Spark's double ordering
  * (java.lang.Double.compare — NaN greater than all), so ties and
  * degenerate zero-norm vectors break toward the HIGHER centroid id.
  */
case class NearestCentroid(
    child: Expression,
    cids: Array[Long],
    mat: Array[Array[Double]]) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cids.length == mat.length && cids.nonEmpty, "cids/mat must align, non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroidImpl.eval(input.asInstanceOf[ArrayData], cids, mat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.NearestCentroidImpl.eval($v, $cidsRef, $matRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidImpl {
  def eval(nv: ArrayData, cids: Array[Long], mat: Array[Array[Double]]): Long = {
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MinValue
    var i = 0
    while (i < mat.length) {
      val c = mat(i)
      val n = math.min(nv.numElements(), c.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += nv.getDouble(j) * c(j); j += 1 }
      val cmp = java.lang.Double.compare(s, bestSim)
      if (cmp > 0 || (cmp == 0 && cids(i) > bestCid)) { bestSim = s; bestCid = cids(i) }
      i += 1
    }
    bestCid
  }
}

/** Asymmetric-distance (ADC) lookup for product-quantized codes: given
  * a per-subspace distance table `dtab` (m × k, built ONCE on the
  * driver from the probe vector: dtab(j)(c) = ‖q_j − cell(j,c)‖²) and a
  * row's code array (m small ints), returns Σ_j dtab(j)(codes(j)) — the
  * PQ-approximate squared L2 distance. This is FAISS's ADC inner loop:
  * the scan touches m bytes per row instead of d floats (m=4 vs d=64 →
  * 64× less data), which is the whole point of PQ at 100 TB.
  *
  * Same codegen strategy as [[NearestCentroid]]: the table rides as a
  * reference object (never inlined into generated source), the lookup
  * is a constant-size static call. Out-of-range codes contribute 0
  * (encode never emits them; the guard keeps a corrupt code file from
  * throwing mid-scan).
  */
case class AdcLookup(child: Expression, dtab: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(dtab.nonEmpty, "empty distance table")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> codes, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_lookup"

  override protected def nullSafeEval(input: Any): Any =
    AdcLookupImpl.eval(input.asInstanceOf[ArrayData], dtab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("dtab", dtab, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.AdcLookupImpl.eval($v, $tabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AdcLookupImpl {
  def eval(codes: ArrayData, dtab: Array[Array[Double]]): Double = {
    val m = math.min(codes.numElements(), dtab.length)
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      val row = dtab(j)
      if (c >= 0 && c < row.length) s += row(c)
      j += 1
    }
    s
  }
}

/** All `tables` banded hyperplane-LSH bucket keys of a vector in ONE
  * pass: key t = (t << numPlanes) | sign-bits of the vector against
  * that table's `numPlanes` hyperplanes. The plane matrix (tables ×
  * numPlanes rows of dim components) rides as a codegen reference
  * object exactly like [[NearestCentroid]]'s centroids — the
  * composable `aggregate(zip_with(...))` form this replaces ran
  * INTERPRETED per plane (tables × numPlanes × dim virtual calls per
  * row: 192 interpreted projections at the q26 dial — it alone pushed
  * the query to ~14 s at sf0.1; this loop does the same 49M mul-adds
  * in ~tens of ms). Output length is `tables`, one explode away from
  * the band join.
  */
case class LshBucketKeys(child: Expression, mat: Array[Array[Double]],
    numPlanes: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numPlanes > 0 && numPlanes < 56 && tables > 0 &&
    mat.length == tables * numPlanes, "mat must hold tables*numPlanes planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bucket_keys"

  override protected def nullSafeEval(input: Any): Any =
    LshBucketKeysImpl.eval(input.asInstanceOf[ArrayData], mat, numPlanes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.LshBucketKeysImpl.eval($v, $matRef, $numPlanes, $tables);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketKeysImpl {
  def eval(nv: ArrayData, mat: Array[Array[Double]], numPlanes: Int,
      tables: Int): ArrayData = {
    // Strict dim check: a vector shorter/longer than the plane dim would
    // otherwise compute sign bits from a prefix — silent recall loss.
    if (nv.numElements() != mat(0).length) throw new IllegalArgumentException(
      s"graft_lsh_bucket_keys: vector dim ${nv.numElements()} != plane dim ${mat(0).length}")
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = t.toLong << numPlanes
      var p = 0
      while (p < numPlanes) {
        val row = mat(t * numPlanes + p)
        val n = row.length
        var s = 0.0
        var j = 0
        while (j < n) { s += nv.getDouble(j) * row(j); j += 1 }
        if (s >= 0) key |= (1L << p)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {
  /** Column-level entry point: `dot(a, b)` with both sides
    * array<double> (cast upstream — float arrays must be transformed
    * once, not per use).
    */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** `lshBucketKeys(nv, mat, numPlanes, tables)`: all banded-LSH
    * table keys of a normalized vector.
    */
  def lshBucketKeys(nv: Column, mat: Array[Array[Double]], numPlanes: Int,
      tables: Int): Column =
    bridge.column(LshBucketKeys(bridge.expression(nv), mat, numPlanes, tables))

  /** `nearestCentroid(nv, cids, mat)`: id of the max-dot centroid. */
  def nearestCentroid(nv: Column, cids: Array[Long], mat: Array[Array[Double]]): Column =
    bridge.column(NearestCentroid(bridge.expression(nv), cids, mat))

  /** `adcLookup(codes, dtab)`: PQ-approximate squared L2 distance. */
  def adcLookup(codes: Column, dtab: Array[Array[Double]]): Column =
    bridge.column(AdcLookup(bridge.expression(codes), dtab))
}
