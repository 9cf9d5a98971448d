package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VideoCodec

/** operators/VideoCodec pinned on container ground truth: RIFF/AVI
  * magic and standard chunk layout in the encoded bytes, bit-exact
  * frame round trip (uncompressed DIB is a lossless byte permutation
  * — bottom-up BGR padded rows vs our top-down packed RGB), header
  * metadata (dimensions / fps / frame count) surviving the trip, and
  * the rejection paths (wrong frame size, truncated container, frame
  * count disagreeing with the header, non-AVI bytes, compressed or
  * non-24-bit streams).
  */
class VideoCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) % 256).toByte)

  test("encode produces a standard RIFF/AVI layout") {
    val avi = VideoCodec.encodeAvi(Seq(frame(6, 4, 1), frame(6, 4, 2)), 6, 4, 25)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val body = new String(avi, "ISO-8859-1")
    for (tag <- Seq("hdrl", "avih", "strl", "strh", "vids", "DIB ",
        "strf", "movi", "00db", "idx1"))
      assert(body.contains(tag), s"missing '$tag' chunk")
    // RIFF size field == file length - 8 (exact, not just <=)
    val declared = (avi(4) & 0xff) | ((avi(5) & 0xff) << 8) |
      ((avi(6) & 0xff) << 16) | ((avi(7) & 0xff) << 24)
    assert(declared == avi.length - 8)
  }

  test("decode(encode) is bit-exact and preserves header metadata") {
    // widths chosen to exercise all four stride-padding residues
    for ((w, h, fps) <- Seq((4, 3, 25), (5, 2, 30), (6, 5, 10), (7, 3, 1))) {
      val fs = (1 to 4).map(frame(w, h, _))
      val v = VideoCodec.decodeAvi(VideoCodec.encodeAvi(fs, w, h, fps))
      assert(v.width == w && v.height == h && v.fps == fps,
        s"metadata mangled at ${w}x$h@$fps")
      assert(v.frames.length == 4)
      fs.zip(v.frames).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.toSeq == b.toSeq, s"frame $i mangled at ${w}x$h")
      }
    }
  }

  test("wrong-size frames are rejected at encode") {
    intercept[IllegalArgumentException] {
      VideoCodec.encodeAvi(Seq(frame(4, 4, 1).take(10)), 4, 4)
    }
    intercept[IllegalArgumentException] {
      VideoCodec.encodeAvi(Seq.empty, 4, 4)
    }
  }

  test("truncated container is rejected, not misparsed") {
    val avi = VideoCodec.encodeAvi(Seq(frame(6, 4, 1), frame(6, 4, 2)), 6, 4)
    intercept[Exception] { VideoCodec.decodeAvi(avi.take(avi.length - 40)) }
    intercept[Exception] { VideoCodec.decodeAvi(avi.take(20)) }
  }

  test("frame count disagreeing with the avih header is rejected") {
    val one = VideoCodec.encodeAvi(Seq(frame(4, 2, 1)), 4, 2)
    // Corrupt dwTotalFrames (avih payload offset 16; avih data starts
    // at 12 + 12 + 8 = 32, so the field lives at byte 48).
    one(48) = 9
    intercept[Exception] { VideoCodec.decodeAvi(one) }
  }

  test("non-AVI bytes are rejected") {
    intercept[Exception] { VideoCodec.decodeAvi("definitely not video".getBytes) }
    // a valid RIFF that is not AVI (WAV) must also be rejected
    val wav = AudioCodec_wavBytes
    intercept[Exception] { VideoCodec.decodeAvi(wav) }
  }

  private def AudioCodec_wavBytes: Array[Byte] =
    graft.operators.AudioCodec.encodeWav(new Array[Byte](64), 8000, 1)

  test("compressed / non-24-bit streams are rejected") {
    val avi = VideoCodec.encodeAvi(Seq(frame(4, 2, 1)), 4, 2)
    // strf BITMAPINFOHEADER payload starts after: RIFF(12) + LIST hdrl
    // hdr(12) + avih(8+56) + LIST strl hdr(12) + strh(8+56) + strf
    // hdr(8) = 172.
    val bitCountOff = 172 + 14
    val compressionOff = 172 + 16
    val b16 = avi.clone(); b16(bitCountOff) = 16
    intercept[Exception] { VideoCodec.decodeAvi(b16) }
    val rle = avi.clone(); rle(compressionOff) = 1 // BI_RLE8
    intercept[Exception] { VideoCodec.decodeAvi(rle) }
  }

  test("JUNK padding chunks are tolerated (real-world AVI layout)") {
    val fs = Seq(frame(6, 4, 1), frame(6, 4, 2))
    val avi = VideoCodec.encodeAvi(fs, 6, 4, 25)
    def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >>> 8) & 0xff).toByte
      b(o + 2) = ((v >>> 16) & 0xff).toByte; b(o + 3) = ((v >>> 24) & 0xff).toByte
    }
    // splice a 16-byte JUNK chunk between LIST hdrl and LIST movi —
    // the alignment padding most real muxers emit
    val hdrlEnd = 12 + 8 + le32(avi, 16)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](16, 0, 0, 0) ++ new Array[Byte](16)
    val spliced = avi.take(hdrlEnd) ++ junk ++ avi.drop(hdrlEnd)
    putLe32(spliced, 4, le32(avi, 4) + junk.length) // patch riffSize
    val v = VideoCodec.decodeAvi(spliced)
    assert(v.width == 6 && v.height == 4 && v.fps == 25 && v.frames.length == 2)
    fs.zip(v.frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  // Smooth triangle-wave frame (continuous, no wrap discontinuity) —
  // the content class MJPEG's DCT handles with small, bounded error.
  private def smoothFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val x = (i / 3) % w; val y = (i / 3) / w; val c = i % 3
      val t = (x * 3 + y * 5 + seed * 7 + c * 11) % 510
      (if (t > 255) 510 - t else t).toByte
    }

  test("MJPEG: standard layout, MJPG handler, 00dc chunks") {
    val avi = VideoCodec.encodeAviMjpeg(
      Seq(smoothFrame(48, 32, 1), smoothFrame(48, 32, 2)), 48, 32, 25)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    val body = new String(avi, "ISO-8859-1")
    for (tag <- Seq("hdrl", "avih", "strl", "strh", "vids", "MJPG",
        "strf", "movi", "00dc", "idx1"))
      assert(body.contains(tag), s"missing '$tag' chunk")
    assert(!body.contains("00db"), "MJPEG stream must not emit DIB chunks")
    val declared = (avi(4) & 0xff) | ((avi(5) & 0xff) << 8) |
      ((avi(6) & 0xff) << 16) | ((avi(7) & 0xff) << 24)
    assert(declared == avi.length - 8)
  }

  test("MJPEG: round trip is deterministic with bounded pixel error") {
    val w = 48; val h = 32
    val fs = (1 to 4).map(smoothFrame(w, h, _))
    val avi1 = VideoCodec.encodeAviMjpeg(fs, w, h, 30)
    val avi2 = VideoCodec.encodeAviMjpeg(fs, w, h, 30)
    assert(avi1.toSeq == avi2.toSeq, "JDK JPEG encode must be deterministic")
    val v = VideoCodec.decodeAvi(avi1)
    assert(v.codec == "MJPG" && v.width == w && v.height == h &&
      v.fps == 30 && v.frames.length == 4)
    // Lossy: judged by tolerance, never equality (the PQ pattern).
    val maxErr = fs.zip(v.frames).map { case (a, b) =>
      a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max
    }.max
    assert(maxErr > 0, "MJPEG should be lossy on gradient content")
    assert(maxErr <= 48, s"decoded pixel error $maxErr exceeds tolerance 48")
    // And compression must actually compress vs the DIB container.
    val dib = VideoCodec.encodeAvi(fs, w, h, 30)
    assert(avi1.length < dib.length / 2,
      s"MJPEG ${avi1.length}B should beat DIB ${dib.length}B by 2x+ on gradients")
  }

  test("MJPEG: disagreeing handler/biCompression and torn chunks rejected") {
    val avi = VideoCodec.encodeAviMjpeg(Seq(smoothFrame(16, 16, 1)), 16, 16)
    // strf biCompression lives at the same fixed offset as the DIB
    // layout (identical header sizes): flip MJPG -> BI_RGB == torn.
    val torn = avi.clone()
    for (i <- 0 until 4) torn(172 + 16 + i) = 0
    intercept[Exception] { VideoCodec.decodeAvi(torn) }
    // Zeroing the first frame chunk's bytes makes it undecodable as
    // JPEG — must surface as an error, not a silent skip.
    val body = new String(avi, "ISO-8859-1")
    val chunkOff = body.indexOf("00dc")
    val blanked = avi.clone()
    for (i <- chunkOff + 8 until math.min(chunkOff + 40, avi.length))
      blanked(i) = 0
    intercept[Exception] { VideoCodec.decodeAvi(blanked) }
  }

  test("property: decode(encode(frames)) == frames for seeded random clips") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 9)
      n <- Gen.choose(1, 6)
      fps <- Gen.oneOf(1, 24, 25, 30, 60)
      fs <- Gen.listOfN(n,
        Gen.listOfN(w * h * 3, Gen.choose(-128, 127).map(_.toByte)))
    } yield (fs.map(_.toArray), w, h, fps)
    (0 until 12).foreach { i =>
      val (fs, w, h, fps) =
        gen.apply(Gen.Parameters.default, Seed(0xA71DE0L + i)).get
      val v = VideoCodec.decodeAvi(VideoCodec.encodeAvi(fs, w, h, fps))
      assert(v.width == w && v.height == h && v.fps == fps &&
        v.frames.length == fs.length, s"case $i metadata mangled")
      fs.zip(v.frames).zipWithIndex.foreach { case ((a, b), j) =>
        assert(a.toSeq == b.toSeq, s"case $i frame $j mangled (${w}x$h)")
      }
    }
  }
}
