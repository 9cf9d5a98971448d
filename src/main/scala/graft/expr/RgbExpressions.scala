package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** REAL raw-bitmap image ops over opaque `binary` columns — like
  * [[PcmImpl]] for audio, the image-side work that needs NO external
  * codec and therefore is not stubbed (operators/Multimodal.scala
  * stubs only the compressed-format decode seam): packed RGB888
  * buffers (row-major, 3 bytes/pixel) get integer BT.601 luma
  * histograms, luma sums, and nearest-neighbor resize — the
  * thumbnail / brightness-profile primitives an image curation
  * pipeline runs before any model. All arithmetic is EXACT integer
  * (luma = (77r + 150g + 29b) >> 8; resize source index =
  * (y2*h1/h2)*w1 + x2*w1/w2 in integer division), so a SQL oracle
  * reproduces every output bit-for-bit. Codegen byte loops; payloads
  * never shuffle.
  */
object RgbImpl {
  def bytesPack(vals: ArrayData): Array[Byte] = {
    val n = vals.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = vals.getLong(i)
      require(v >= 0L && v <= 255L, s"byte value out of range [0,255]: $v")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  @inline private def luma(buf: Array[Byte], p: Int): Int = {
    val r = buf(3 * p) & 0xff
    val g = buf(3 * p + 1) & 0xff
    val b = buf(3 * p + 2) & 0xff
    (77 * r + 150 * g + 29 * b) >> 8
  }

  def lumaHist(buf: Array[Byte], bins: Int): ArrayData = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(buf.length % 3 == 0,
      s"RGB888 payload length must be a multiple of 3, got ${buf.length}")
    val out = new Array[Long](bins)
    val n = buf.length / 3
    var p = 0
    while (p < n) {
      out(luma(buf, p) * bins / 256) += 1L
      p += 1
    }
    new GenericArrayData(out)
  }

  def lumaSum(buf: Array[Byte]): Long = {
    require(buf.length % 3 == 0,
      s"RGB888 payload length must be a multiple of 3, got ${buf.length}")
    var acc = 0L
    val n = buf.length / 3
    var p = 0
    while (p < n) { acc += luma(buf, p); p += 1 }
    acc
  }

  /** Per-boundary motion energy of a raw video buffer (concatenated
    * fixed-size frames): Σ |Δbyte| between each consecutive frame
    * pair — the scene-cut / static-clip detector of video curation,
    * exact integer so a SQL oracle reproduces it bit-for-bit.
    */
  def motion(buf: Array[Byte], frameBytes: Int): ArrayData = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(buf.length % frameBytes == 0,
      s"payload length ${buf.length} is not a multiple of frame size $frameBytes")
    val nf = buf.length / frameBytes
    val out = new Array[Long](math.max(nf - 1, 0))
    var b = 0
    while (b < nf - 1) {
      var acc = 0L
      var i = 0
      val o = b * frameBytes
      while (i < frameBytes) {
        acc += math.abs((buf(o + i) & 0xff) - (buf(o + frameBytes + i) & 0xff)).toLong
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def resizeNearest(buf: Array[Byte], w1: Int, h1: Int, w2: Int, h2: Int): Array[Byte] = {
    require(w1 > 0 && h1 > 0 && w2 > 0 && h2 > 0,
      s"dimensions must be positive, got ${w1}x$h1 -> ${w2}x$h2")
    // long-math size checks: w*h*3 silently overflows Int for large
    // SQL-literal dimensions, turning into a wrong-size or negative
    // allocation (the PCM expressions' validation style).
    require(w1.toLong * h1 * 3 <= Int.MaxValue,
      s"source ${w1}x$h1 exceeds the 2 GiB buffer limit")
    require(w2.toLong * h2 * 3 <= Int.MaxValue,
      s"target ${w2}x$h2 exceeds the 2 GiB buffer limit")
    require(buf.length == w1 * h1 * 3,
      s"RGB888 payload must be ${w1 * h1 * 3} bytes for ${w1}x$h1, got ${buf.length}")
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = y * h1 / h2
      var x = 0
      while (x < w2) {
        val sp = (sy * w1 + x * w1 / w2) * 3
        val dp = (y * w2 + x) * 3
        out(dp) = buf(sp); out(dp + 1) = buf(sp + 1); out(dp + 2) = buf(sp + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}

/** array<bigint> in [0,255] → raw bytes. */
case class BytesPack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bytes_pack"
  override protected def nullSafeEval(input: Any): Any =
    RgbImpl.bytesPack(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.expr.RgbImpl.bytesPack($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RGB888 binary → `bins`-bin integer-luma histogram (array<bigint>). */
case class RgbLumaHist(child: Expression, bins: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rgb_luma_hist"
  override protected def nullSafeEval(input: Any): Any =
    RgbImpl.lumaHist(input.asInstanceOf[Array[Byte]], bins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.RgbImpl.lumaHist($a, $bins);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RGB888 binary → sum of per-pixel integer lumas. */
case class RgbLumaSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rgb_luma_sum"
  override protected def nullSafeEval(input: Any): Any =
    RgbImpl.lumaSum(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.expr.RgbImpl.lumaSum($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RGB888 binary w1×h1 → nearest-neighbor-resized w2×h2 binary. */
case class RgbResizeNearest(child: Expression, w1: Int, h1: Int, w2: Int, h2: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_rgb_resize"
  override protected def nullSafeEval(input: Any): Any =
    RgbImpl.resizeNearest(input.asInstanceOf[Array[Byte]], w1, h1, w2, h2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.RgbImpl.resizeNearest($a, $w1, $h1, $w2, $h2);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Concatenated-frame binary → array<bigint> per-boundary Σ|Δbyte|. */
case class RgbMotion(child: Expression, frameBytes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rgb_motion"
  override protected def nullSafeEval(input: Any): Any =
    RgbImpl.motion(input.asInstanceOf[Array[Byte]], frameBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.RgbImpl.motion($a, $frameBytes);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RgbExpressions {
  def bytesPack(vals: Column): Column =
    bridge.column(BytesPack(bridge.expression(vals)))
  def rgbLumaHist(payload: Column, bins: Int): Column =
    bridge.column(RgbLumaHist(bridge.expression(payload), bins))
  def rgbLumaSum(payload: Column): Column =
    bridge.column(RgbLumaSum(bridge.expression(payload)))
  def rgbResizeNearest(payload: Column, w1: Int, h1: Int, w2: Int, h2: Int): Column =
    bridge.column(RgbResizeNearest(bridge.expression(payload), w1, h1, w2, h2))
  def rgbMotion(payload: Column, frameBytes: Int): Column =
    bridge.column(RgbMotion(bridge.expression(payload), frameBytes))
}
