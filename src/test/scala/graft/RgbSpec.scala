package graft

import org.apache.spark.sql.functions._

/** expr/RgbExpressions pinned on hand-computed bitmap ground truth:
  * integer BT.601 luma, histogram binning at the boundaries,
  * nearest-neighbor source-index mapping, and the malformed-buffer
  * rejections.
  */
class RgbSpec extends SparkSpec {
  import spark.implicits._
  import graft.expr.RgbExpressions._

  private def pack(vals: Seq[Long]) =
    Seq(Tuple1(vals)).toDF("v").select(bytesPack(col("v")).as("b"))

  test("luma: pure white 255, pure black 0, pure red floor(77*255/256) = 76") {
    val img = pack(Seq( // 3 pixels: white, black, red
      255L, 255L, 255L, 0L, 0L, 0L, 255L, 0L, 0L))
    val hist = img.select(rgbLumaHist(col("b"), 256).as("h"))
      .collect().head.getSeq[Long](0)
    assert(hist(255) == 1L && hist(0) == 1L && hist(76) == 1L,
      s"nonzero bins: ${hist.zipWithIndex.filter(_._1 > 0)}")
    val sum = img.select(rgbLumaSum(col("b"))).collect().head.getLong(0)
    assert(sum == 255L + 0L + 76L)
  }

  test("histogram binning: luma 31 -> bin 0, luma 32 -> bin 1 (8 bins over 256)") {
    // gray (v,v,v) has luma exactly v (weights sum to 256).
    val img = pack(Seq(31L, 31L, 31L, 32L, 32L, 32L))
    val hist = img.select(rgbLumaHist(col("b"), 8).as("h"))
      .collect().head.getSeq[Long](0)
    assert(hist.toSeq == Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L), hist.toString)
  }

  test("nearest-neighbor 2x2 -> 1x1 keeps the TOP-LEFT pixel (floor mapping)") {
    val img = pack(Seq( // 2x2: TL=10, TR=20, BL=30, BR=40 (grays)
      10L, 10L, 10L, 20L, 20L, 20L, 30L, 30L, 30L, 40L, 40L, 40L))
    val thumb = img.select(rgbResizeNearest(col("b"), 2, 2, 1, 1).as("t"))
      .collect().head.getAs[Array[Byte]](0)
    assert(thumb.toSeq == Seq[Byte](10, 10, 10), thumb.toSeq.toString)
  }

  test("4x2 -> 2x1 resize samples columns 0 and 2 of row 0") {
    val grays = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L) // row0: 1,2,3,4; row1: 5,6,7,8
    val img = pack(grays.flatMap(v => Seq(v, v, v)))
    val thumb = img.select(rgbResizeNearest(col("b"), 4, 2, 2, 1).as("t"))
      .collect().head.getAs[Array[Byte]](0)
    assert(thumb.toSeq == Seq[Byte](1, 1, 1, 3, 3, 3), thumb.toSeq.toString)
  }

  test("motion: hand-computed per-boundary sums; identical frames give exactly 0") {
    // Frames of 2 bytes: [10, 20] [10, 20] [0, 50] → motions 0, 40.
    val clip = pack(Seq(10L, 20L, 10L, 20L, 0L, 50L))
    val got = clip.select(rgbMotion(col("b"), 2).as("m"))
      .collect().head.getSeq[Long](0)
    assert(got.toSeq == Seq(0L, 40L), got.toString)
    // A single frame has no boundaries.
    val one = pack(Seq(1L, 2L)).select(rgbMotion(col("b"), 2).as("m"))
      .collect().head.getSeq[Long](0)
    assert(one.isEmpty)
  }

  test("q322 media pipeline: every verdict class appears and the gates fire exactly on the engineered ids") {
    val got = Queries.all("q322_media_pipeline")(spark, "unused")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // Silence (id % 4 == 0) outranks static; static = id % 5 == 0.
    (1L to 40L).foreach { id =>
      if (id % 4 == 0) assert(got(id) == "silent", s"id $id: ${got(id)}")
      else if (id % 5 == 0) assert(got(id) == "static", s"id $id: ${got(id)}")
    }
    // Visual twins (i, i+20): where both survive, the younger is the dup.
    (1L to 20L).foreach { i =>
      val surv = Seq(i, i + 20).filter(id => id % 4 != 0 && id % 5 != 0)
      if (surv.length == 2) {
        assert(got(surv.head) == "kept" && got(surv.last) == "duplicate",
          s"pair $surv: ${surv.map(got)}")
      } else surv.foreach(id => assert(got(id) == "kept", s"solo $id: ${got(id)}"))
    }
    assert(got.values.toSet == Set("silent", "static", "kept", "duplicate"))
  }

  test("malformed buffers are rejected: non-multiple-of-3 and wrong resize length") {
    def root(e: Throwable): Throwable =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq.last
    val e1 = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1, 2))).toDF("b")
        .select(rgbLumaHist(col("b"), 8)).collect()
    }
    assert(root(e1).getMessage.contains("multiple of 3"), e1.toString)
    val e2 = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
        .select(rgbResizeNearest(col("b"), 2, 2, 1, 1)).collect()
    }
    assert(root(e2).getMessage.contains("bytes for 2x2"), e2.toString)
    val e3 = intercept[Exception] {
      Seq(Tuple1(Seq(300L))).toDF("v").select(bytesPack(col("v"))).collect()
    }
    assert(root(e3).getMessage.contains("out of range"), e3.toString)
  }

  test("PNG codec: encode->decode round-trips RGB888 bit-for-bit (lossless contract)") {
    import graft.operators.ImageCodec
    // q318's synthetic bitmap for media_id=5 (16x12, byte i = (5*31+7i)%256)
    val rgb = Array.tabulate(576)(i => ((5 * 31 + i * 7) % 256).toByte)
    val png = ImageCodec.encodePng(rgb, 16, 12)
    // Real PNG container: magic bytes present, compression actually ran.
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte,
      s"not a PNG header: ${png.take(4).map(_ & 0xff).mkString(",")}")
    val back = ImageCodec.decodeToRgb(png)
    assert(back.sameElements(rgb),
      "PNG round trip must be lossless for 8-bit RGB")
  }

  test("PngCodec decodes through the MediaCodec seam: features match FakeCodec on raw pixels") {
    import graft.operators.{ImageCodec, Multimodal}
    val rgb = Array.tabulate(576)(i => ((7 * 31 + i * 7) % 256).toByte)
    val rec = Multimodal.MediaRecord(7L, "image", "image/png", 16, 12, 0L,
      ImageCodec.encodePng(rgb, 16, 12))
    val viaPng = ImageCodec.PngCodec.decode(rec)
    val viaRaw = Multimodal.FakeCodec.decode(rec.copy(payload = rgb))
    assert(viaPng == viaRaw.copy(feature = viaPng.feature) &&
      viaPng.feature.sameElements(viaRaw.feature),
      s"decoded-pixel features must equal raw-pixel features: $viaPng vs $viaRaw")
  }

  test("PNG codec rejects garbage payloads and mismatched dimensions") {
    import graft.operators.ImageCodec
    val e1 = intercept[Exception] {
      ImageCodec.decodeToRgb(Array[Byte](1, 2, 3, 4))
    }
    assert(e1.getMessage.contains("not a decodable image"), e1.toString)
    val e2 = intercept[Exception] {
      ImageCodec.encodePng(Array[Byte](1, 2, 3), 2, 2)
    }
    assert(e2.getMessage.contains("bytes for 2x2"), e2.toString)
  }
}
