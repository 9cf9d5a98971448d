package graft

import org.apache.spark.sql.functions._

/** expr/PcmExpressions pinned on DSP ground truth: LE byte layout,
  * saturating quantizer, frame RMS against closed forms (constant
  * signal, full-scale square wave, sine ≈ A/√2), trailing-partial
  * averaging, and the torn-payload rejection.
  */
class PcmSpec extends SparkSpec {
  import spark.implicits._
  import graft.expr.PcmExpressions._

  private def packOne(samples: Seq[Long]): Array[Byte] =
    Seq(Tuple1(samples)).toDF("s").select(pcmPack(col("s")).as("b"))
      .collect().head.getAs[Array[Byte]](0)

  private def rmsOne(samples: Seq[Long], frame: Int): Seq[Double] =
    Seq(Tuple1(samples)).toDF("s")
      .select(pcmFrameRms(pcmPack(col("s")), frame).as("r"))
      .collect().head.getSeq[Double](0)

  test("pack: little-endian int16 layout, negative two's complement, saturation at the rails") {
    val b = packOne(Seq(1L, -1L, 258L, 40000L, -40000L))
    assert(b.toSeq == Seq[Byte](
      1, 0, // 1
      -1, -1, // -1 = 0xFFFF
      2, 1, // 258 = 0x0102
      -1, 127, // clamped to 32767 = 0x7FFF
      0, -128)) // clamped to -32768 = 0x8000
  }

  test("frame RMS: constant signal gives |c|; full-scale square wave gives the rail") {
    assert(rmsOne(Seq.fill(8)(100L), 4) == Seq(100.0, 100.0))
    val sq = (0 until 8).map(i => if (i % 2 == 0) 32767L else -32767L)
    assert(rmsOne(sq, 8) == Seq(32767.0))
  }

  test("frame RMS: quantized sine approaches A/sqrt(2); silence is exactly 0") {
    val amp = 10000.0
    val sine = (0 until 1000).map(t => math.floor(amp * math.sin(t * 0.1)).toLong)
    val Seq(rms) = rmsOne(sine, 1000)
    assert(math.abs(rms - amp / math.sqrt(2.0)) < amp * 0.01, s"rms $rms")
    assert(rmsOne(Seq.fill(6)(0L), 3) == Seq(0.0, 0.0))
  }

  test("trailing partial frame averages over its own length") {
    // frames of 4: [3,3,3,3] then [6,6] — RMS 3 and 6, not 6/sqrt(2).
    assert(rmsOne(Seq(3L, 3L, 3L, 3L, 6L, 6L), 4) == Seq(3.0, 6.0))
  }

  test("torn payload (odd byte count) is rejected, not silently truncated") {
    val e = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1, 0, 7))).toDF("b")
        .select(pcmFrameRms(col("b"), 4)).collect()
    }
    assert(e.getMessage.contains("even byte length") ||
      Option(e.getCause).exists(_.getMessage.contains("even byte length")),
      e.toString)
  }
}
