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
