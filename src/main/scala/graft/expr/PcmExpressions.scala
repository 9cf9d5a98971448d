package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** REAL audio processing over opaque `binary` columns — the part of
  * the multimodal stack that needs no external codec and therefore is
  * NOT stubbed (operators/Multimodal.scala stubs the image/video
  * decode seam; 16-bit PCM is just arithmetic on bytes): pack signed
  * samples into little-endian int16 frames and compute per-frame RMS
  * energy — the voice-activity / silence-trim primitive every audio
  * curation pipeline runs before anything model-shaped. Both are
  * codegen'd byte loops; payloads stay narrow map-side bytes and only
  * the small energy arrays move.
  */
object PcmImpl {
  /** array<long> samples → LE int16 bytes, clamped to the int16 range
    * (the standard saturating PCM quantizer).
    */
  def pack(samples: ArrayData): Array[Byte] = {
    val n = samples.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v0 = samples.getLong(i)
      val v = if (v0 > 32767L) 32767 else if (v0 < -32768L) -32768 else v0.toInt
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** LE int16 payload → per-frame RMS (frames of `frameSize` samples;
    * the trailing partial frame, if any, is averaged over its own
    * length). Odd byte counts are rejected — a torn PCM payload is a
    * data error, not a truncation to hide.
    */
  def frameRms(payload: Array[Byte], frameSize: Int): ArrayData = {
    require(payload.length % 2 == 0,
      s"PCM16 payload must have even byte length, got ${payload.length}")
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    val n = payload.length / 2
    val nFrames = (n + frameSize - 1) / frameSize
    val out = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      val lo = f * frameSize
      val hi = math.min(lo + frameSize, n)
      var acc = 0.0
      var i = lo
      while (i < hi) {
        val s = ((payload(2 * i) & 0xff) | (payload(2 * i + 1) << 8)).toShort.toDouble
        acc += s * s
        i += 1
      }
      out(f) = math.sqrt(acc / (hi - lo))
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** array<bigint> → binary (LE int16, saturating). */
case class PcmPack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pcm_pack"
  override protected def nullSafeEval(input: Any): Any =
    PcmImpl.pack(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.expr.PcmImpl.pack($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** binary (LE int16) → array<double> per-frame RMS. */
case class PcmFrameRms(child: Expression, frameSize: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pcm_frame_rms"
  override protected def nullSafeEval(input: Any): Any =
    PcmImpl.frameRms(input.asInstanceOf[Array[Byte]], frameSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.PcmImpl.frameRms($a, $frameSize);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmExpressions {
  /** Column API: pack array<bigint> samples into LE int16 binary. */
  def pcmPack(samples: Column): Column =
    bridge.column(PcmPack(bridge.expression(samples)))
  /** Column API: per-frame RMS of an LE int16 binary payload. */
  def pcmFrameRms(payload: Column, frameSize: Int): Column =
    bridge.column(PcmFrameRms(bridge.expression(payload), frameSize))
}
