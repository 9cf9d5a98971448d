package graft.operators

import java.io.ByteArrayOutputStream

/** REAL video-container codec: a hand-rolled RIFF/AVI writer + strict
  * parser for UNCOMPRESSED 24-bit DIB video streams AND (since round
  * 11) MJPEG streams — per-frame baseline JPEG through the JDK's own
  * ImageIO, the COMPRESSED-video leg the environment's missing ffmpeg
  * previously left open — the third and
  * final container leg of the multimodal seam (PNG via javax.imageio
  * in [[ImageCodec]], WAV via javax.sound.sampled in [[AudioCodec]];
  * reference: the multimodal stub surface). The environment has no
  * ffmpeg and the JDK ships no video API, but AVI's container layer
  * is plain RIFF — the exact chunk grammar [[AudioCodec]]'s WAV leg
  * already exercises through the JDK — and the `DIB ` (BI_RGB)
  * frame encoding is uncompressed bottom-up BGR rows padded to 4-byte
  * stride: a lossless byte permutation of the packed top-down RGB888
  * buffers the q318/q319 codegen expressions consume. Lossless means
  * a decode(encode) round trip is bit-exact, so the downstream
  * exact-integer oracles (luma histogram, motion energy) hash-match
  * when fed DECODED frames — the same strongest-evidence structure as
  * the PNG and WAV legs.
  *
  * The writer emits the full standard layout — RIFF/AVI → LIST hdrl
  * (avih, LIST strl (strh 'vids'/'DIB ', strf BITMAPINFOHEADER)) →
  * LIST movi ('00db' per frame) → idx1 — so the bytes are a valid
  * AVI any desktop player opens, not a private format. The parser is
  * STRICT: every chunk walk is bounds-checked with long math before
  * any Int sizing (the ImageCodec/AudioCodec guard — header-declared
  * lengths are data-controlled), non-BI_RGB / non-24-bit streams are
  * rejected rather than transcoded, and the decoded frame count must
  * equal the avih-declared total, so torn or truncated containers
  * surface as errors instead of silently short clips.
  *
  * Like the other codec legs this is a deliberate UDF boundary (byte
  * stream parsing, nothing to codegen); payloads decode
  * partition-locally and never shuffle.
  */
object VideoCodec {

  /** Decoded AVI: packed top-down RGB888 frames + header metadata.
    * `codec` is the stream handler the container declared ("DIB " or
    * "MJPG") — callers branch tolerance on it (DIB is lossless, MJPEG
    * is judged by error bound).
    */
  final case class AviVideo(frames: Array[Array[Byte]], width: Int,
      height: Int, fps: Int, codec: String = "DIB ")

  private def fourcc(s: String): Int = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)
  }
  private val RIFF = fourcc("RIFF")
  private val AVI_ = fourcc("AVI ")
  private val LIST = fourcc("LIST")
  private val HDRL = fourcc("hdrl")
  private val AVIH = fourcc("avih")
  private val STRL = fourcc("strl")
  private val STRH = fourcc("strh")
  private val STRF = fourcc("strf")
  private val VIDS = fourcc("vids")
  private val DIB_ = fourcc("DIB ")
  private val MOVI = fourcc("movi")
  private val DB00 = fourcc("00db")
  private val DC00 = fourcc("00dc")
  private val IDX1 = fourcc("idx1")
  private val MJPG = fourcc("MJPG")

  private final class LeWriter {
    val bos = new ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def i16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def bytes(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    def zero(n: Int): Unit = { var i = 0; while (i < n) { bos.write(0); i += 1 } }
  }

  private def rowStride(w: Int): Int = (w * 3 + 3) & ~3

  /** Wrap packed top-down RGB888 frames in a standard RIFF/AVI
    * container with an uncompressed `DIB ` video stream and idx1
    * index. All frames must be the same w×h.
    */
  def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 25): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0,
      s"dimensions/fps must be positive, got ${w}x$h@$fps")
    require(frames.nonEmpty, "need at least one frame")
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"${w}x$h RGB888 exceeds a JVM array (${w.toLong * h * 3} bytes)")
    val frameLen = w * h * 3
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == frameLen,
        s"frame $i must be $frameLen bytes for ${w}x$h, got ${f.length}")
    }
    val stride = rowStride(w)
    // LONG math before any Int sizing, including dibLen itself:
    // stride*h in Int can overflow NEGATIVE (w=1, huge h passes the
    // w*h*3 pixel guard since stride pads 3→4 bytes/row) and a
    // negative dibLen would sail through the container bound below.
    // Whole-container bound: per frame 8 (chunk header) + dibLen
    // (pixels) + 16 (idx1 entry) — per-frame overheads included so
    // tiny-frame/huge-count clips can't overflow the Int size fields.
    val dibLenL = stride.toLong * h
    require((dibLenL + 24L) * frames.length + 4096 <= Int.MaxValue,
      s"${frames.length} frames of $dibLenL bytes exceed a JVM array")
    val dibLen = dibLenL.toInt
    val n = frames.length

    val out = new LeWriter
    // Sizes, innermost out: strl list data = strh(8+56) + strf(8+40)
    val strlSize = 4 + 64 + 48
    // hdrl list data = avih(8+56) + LIST strl
    val hdrlSize = 4 + 64 + (8 + strlSize)
    // movi list data = '00db' chunks (dibLen is stride-aligned => even)
    val moviSize = 4 + n * (8 + dibLen)
    val idx1Size = 16 * n
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    out.i32(RIFF); out.i32(riffSize); out.i32(AVI_)

    out.i32(LIST); out.i32(hdrlSize); out.i32(HDRL)
    out.i32(AVIH); out.i32(56)
    out.i32(1000000 / fps)      // dwMicroSecPerFrame
    out.i32(math.min(dibLen.toLong * fps, Int.MaxValue.toLong).toInt) // dwMaxBytesPerSec (Long math: Int would overflow at ~36MB frames × 60fps)
    out.i32(0)                  // dwPaddingGranularity
    out.i32(0x10)               // dwFlags: AVIF_HASINDEX
    out.i32(n)                  // dwTotalFrames
    out.i32(0)                  // dwInitialFrames
    out.i32(1)                  // dwStreams
    out.i32(dibLen + 8)         // dwSuggestedBufferSize
    out.i32(w); out.i32(h)
    out.zero(16)                // dwReserved[4]

    out.i32(LIST); out.i32(strlSize); out.i32(STRL)
    out.i32(STRH); out.i32(56)
    out.i32(VIDS); out.i32(DIB_)
    out.i32(0)                  // dwFlags
    out.i16(0); out.i16(0)      // wPriority, wLanguage
    out.i32(0)                  // dwInitialFrames
    out.i32(1)                  // dwScale
    out.i32(fps)                // dwRate (fps = rate/scale)
    out.i32(0)                  // dwStart
    out.i32(n)                  // dwLength (frames)
    out.i32(dibLen + 8)         // dwSuggestedBufferSize
    out.i32(-1)                 // dwQuality (default)
    out.i32(0)                  // dwSampleSize
    out.i16(0); out.i16(0); out.i16(w); out.i16(h) // rcFrame

    out.i32(STRF); out.i32(40)
    out.i32(40)                 // biSize
    out.i32(w); out.i32(h)      // biWidth, biHeight (+h = bottom-up)
    out.i16(1); out.i16(24)     // biPlanes, biBitCount
    out.i32(0)                  // biCompression = BI_RGB
    out.i32(dibLen)             // biSizeImage
    out.i32(0); out.i32(0)      // biXPelsPerMeter, biYPelsPerMeter
    out.i32(0); out.i32(0)      // biClrUsed, biClrImportant

    out.i32(LIST); out.i32(moviSize); out.i32(MOVI)
    val row = new Array[Byte](stride) // trailing pad bytes stay 0
    frames.foreach { f =>
      out.i32(DB00); out.i32(dibLen)
      var y = h - 1
      while (y >= 0) { // bottom-up rows, BGR pixel order
        var x = 0
        while (x < w) {
          val p = 3 * (y * w + x)
          row(3 * x) = f(p + 2); row(3 * x + 1) = f(p + 1); row(3 * x + 2) = f(p)
          x += 1
        }
        out.bytes(row)
        y -= 1
      }
    }

    out.i32(IDX1); out.i32(idx1Size)
    var off = 4 // offsets relative to the 'movi' fourcc
    var i = 0
    while (i < n) {
      out.i32(DB00); out.i32(0x10) // AVIIF_KEYFRAME
      out.i32(off); out.i32(dibLen)
      off += 8 + dibLen
      i += 1
    }
    out.bos.toByteArray
  }

  /** Wrap packed top-down RGB888 frames in a RIFF/AVI container as an
    * MJPEG stream — each frame is an independent BASELINE JPEG from
    * the JDK's own writer ([[ImageCodec.encodeJpeg]]), stream handler
    * and biCompression `MJPG`, frame chunks `00dc` (compressed).
    * This closes the COMPRESSED-video leg of the codec seam without
    * ffmpeg: the container walk is the same strict RIFF grammar as
    * the DIB leg, and the per-frame codec is the same JDK decoder the
    * PNG leg (q323) already proves. MJPEG-in-AVI is the standard
    * no-interframe-compression profile (every frame a keyframe), so
    * frame extraction / sampling stays chunk-local — exactly the
    * access pattern a 100 TB frame-sampling pipeline wants.
    *
    * Chunk sizes vary per frame: odd-sized JPEGs pad to even per RIFF
    * (pad byte excluded from the declared size and the idx1 entry);
    * dwSuggestedBufferSize carries the LARGEST chunk.
    */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 25, quality: Float = 0.9f): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0,
      s"dimensions/fps must be positive, got ${w}x$h@$fps")
    require(frames.nonEmpty, "need at least one frame")
    val jpegs = frames.map(f => ImageCodec.encodeJpeg(f, w, h, quality))
    val n = jpegs.length
    val maxChunk = jpegs.map(_.length).max
    val moviSizeL = 4L + jpegs.map(j => 8L + j.length + (j.length & 1)).sum
    val idx1Size = 16 * n
    require(moviSizeL + idx1Size + 4096 <= Int.MaxValue,
      s"$n MJPEG frames (${moviSizeL} movi bytes) exceed a JVM array")
    val moviSize = moviSizeL.toInt

    val out = new LeWriter
    val strlSize = 4 + 64 + 48
    val hdrlSize = 4 + 64 + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    out.i32(RIFF); out.i32(riffSize); out.i32(AVI_)

    out.i32(LIST); out.i32(hdrlSize); out.i32(HDRL)
    out.i32(AVIH); out.i32(56)
    out.i32(1000000 / fps)      // dwMicroSecPerFrame
    out.i32(math.min(maxChunk.toLong * fps, Int.MaxValue.toLong).toInt) // dwMaxBytesPerSec
    out.i32(0)                  // dwPaddingGranularity
    out.i32(0x10)               // dwFlags: AVIF_HASINDEX
    out.i32(n)                  // dwTotalFrames
    out.i32(0)                  // dwInitialFrames
    out.i32(1)                  // dwStreams
    out.i32(maxChunk + 8)       // dwSuggestedBufferSize
    out.i32(w); out.i32(h)
    out.zero(16)                // dwReserved[4]

    out.i32(LIST); out.i32(strlSize); out.i32(STRL)
    out.i32(STRH); out.i32(56)
    out.i32(VIDS); out.i32(MJPG)
    out.i32(0)                  // dwFlags
    out.i16(0); out.i16(0)      // wPriority, wLanguage
    out.i32(0)                  // dwInitialFrames
    out.i32(1)                  // dwScale
    out.i32(fps)                // dwRate
    out.i32(0)                  // dwStart
    out.i32(n)                  // dwLength (frames)
    out.i32(maxChunk + 8)       // dwSuggestedBufferSize
    out.i32(-1)                 // dwQuality (default)
    out.i32(0)                  // dwSampleSize
    out.i16(0); out.i16(0); out.i16(w); out.i16(h) // rcFrame

    out.i32(STRF); out.i32(40)
    out.i32(40)                 // biSize
    out.i32(w); out.i32(h)
    out.i16(1); out.i16(24)     // biPlanes, biBitCount
    out.i32(MJPG)               // biCompression = 'MJPG'
    out.i32(0)                  // biSizeImage (varies per frame)
    out.i32(0); out.i32(0)      // biXPelsPerMeter, biYPelsPerMeter
    out.i32(0); out.i32(0)      // biClrUsed, biClrImportant

    out.i32(LIST); out.i32(moviSize); out.i32(MOVI)
    jpegs.foreach { j =>
      out.i32(DC00); out.i32(j.length)
      out.bytes(j)
      if ((j.length & 1) == 1) out.zero(1) // RIFF even padding
    }

    out.i32(IDX1); out.i32(idx1Size)
    var off = 4
    jpegs.foreach { j =>
      out.i32(DC00); out.i32(0x10) // AVIIF_KEYFRAME (MJPEG: all frames)
      out.i32(off); out.i32(j.length)
      off += 8 + j.length + (j.length & 1)
    }
    out.bos.toByteArray
  }

  private final class LeReader(buf: Array[Byte]) {
    def u32(off: Long): Long = {
      require(off >= 0 && off + 4 <= buf.length, s"read past end at $off")
      val o = off.toInt
      ((buf(o) & 0xffL)) | ((buf(o + 1) & 0xffL) << 8) |
        ((buf(o + 2) & 0xffL) << 16) | ((buf(o + 3) & 0xffL) << 24)
    }
    def i32(off: Long): Int = u32(off).toInt
    def u16(off: Long): Int = {
      require(off >= 0 && off + 2 <= buf.length, s"read past end at $off")
      val o = off.toInt
      (buf(o) & 0xff) | ((buf(o + 1) & 0xff) << 8)
    }
  }

  /** Parse AVI bytes back to packed top-down RGB888 frames + header
    * metadata. Accepts exactly the two stream shapes this engine
    * writes — uncompressed 24-bit BI_RGB `DIB ` (`00db` chunks,
    * lossless) and `MJPG` (`00dc` chunks, each an independent JPEG
    * decoded through the JDK's ImageIO, dims checked against the
    * header) — and rejects anything else rather than transcoding: a
    * curation pipeline wants the mismatch surfaced.
    */
  def decodeAvi(payload: Array[Byte]): AviVideo = {
    val r = new LeReader(payload)
    require(payload.length >= 12 && r.i32(0) == RIFF && r.i32(8) == AVI_,
      "not a RIFF/AVI container")
    val riffSize = r.u32(4)
    require(8 + riffSize <= payload.length,
      s"truncated container: RIFF declares ${riffSize + 8} bytes, " +
        s"got ${payload.length}")
    val end = 8 + riffSize

    var w = -1; var h = -1; var fps = -1; var totalFrames = -1
    var sawVids = false
    var mjpeg = false // handler + biCompression both say 'MJPG'
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    // Walk the hdrl sub-chunks (avih + nested strl lists).
    def parseHdrl(from: Long, to: Long): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = r.i32(off); val sz = r.u32(off + 4)
        require(off + 8 + sz <= to, s"hdrl chunk overruns list at $off")
        if (id == AVIH) {
          require(sz >= 56, s"avih must be >=56 bytes, got $sz")
          totalFrames = r.i32(off + 8 + 16)
          require(r.u32(off + 8 + 24) == 1, "expected exactly one stream")
        } else if (id == LIST && r.i32(off + 8) == STRL) {
          var so = off + 12
          val sEnd = off + 8 + sz
          while (so + 8 <= sEnd) {
            val sid = r.i32(so); val ssz = r.u32(so + 4)
            require(so + 8 + ssz <= sEnd, s"strl chunk overruns list at $so")
            if (sid == STRH) {
              require(ssz >= 56, s"strh must be >=56 bytes, got $ssz")
              require(r.i32(so + 8) == VIDS, "expected a 'vids' stream")
              val handler = r.i32(so + 12)
              require(handler == DIB_ || handler == 0 || handler == MJPG,
                "expected the 'DIB ' (uncompressed) or 'MJPG' handler")
              if (handler == MJPG) mjpeg = true
              val scale = r.u32(so + 8 + 20); val rate = r.u32(so + 8 + 24)
              require(scale > 0 && rate % scale == 0 &&
                rate / scale <= Int.MaxValue, s"bad rate/scale $rate/$scale")
              fps = (rate / scale).toInt
              sawVids = true
            } else if (sid == STRF) {
              require(ssz >= 40, s"strf must hold a BITMAPINFOHEADER, got $ssz")
              w = r.i32(so + 8 + 4); h = r.i32(so + 8 + 8)
              require(w > 0 && h > 0, s"dimensions must be positive: ${w}x$h")
              require(w.toLong * h * 3 <= Int.MaxValue,
                s"${w}x$h RGB888 exceeds a JVM array")
              require(r.u16(so + 8 + 14) == 24, "expected 24-bit pixels")
              val biComp = r.u32(so + 8 + 16)
              require(biComp == 0 || biComp == (MJPG.toLong & 0xffffffffL),
                "expected BI_RGB (uncompressed) or 'MJPG' compression")
              // The strh handler and strf biCompression must AGREE —
              // a container that says DIB in one and MJPG in the
              // other is torn, not a dialect.
              require((biComp != 0) == mjpeg,
                "stream handler and biCompression disagree")
            }
            so += 8 + ssz + (ssz & 1) // RIFF chunks pad to even
          }
        }
        off += 8 + sz + (sz & 1)
      }
    }

    def parseMovi(from: Long, to: Long): Unit = {
      require(w > 0 && sawVids, "movi list before stream headers")
      val stride = rowStride(w)
      val dibLen = stride.toLong * h
      var off = from
      while (off + 8 <= to) {
        val id = r.i32(off); val sz = r.u32(off + 4)
        require(off + 8 + sz <= to, s"movi chunk overruns list at $off")
        if (mjpeg && id == DC00) {
          // Independent JPEG per chunk: the JDK decoder owns the
          // bitstream; we own the container contract — decoded dims
          // must match the header or the clip is torn/mislabeled.
          val j = java.util.Arrays.copyOfRange(
            payload, (off + 8).toInt, (off + 8 + sz).toInt)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
          require(img != null, s"movi chunk at $off is not a decodable JPEG")
          require(img.getWidth == w && img.getHeight == h,
            s"frame decodes ${img.getWidth}x${img.getHeight}, header says ${w}x$h")
          val f = new Array[Byte](w * h * 3)
          var p = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val px = img.getRGB(x, y)
              f(3 * p) = ((px >> 16) & 0xff).toByte
              f(3 * p + 1) = ((px >> 8) & 0xff).toByte
              f(3 * p + 2) = (px & 0xff).toByte
              p += 1; x += 1
            }
            y += 1
          }
          frames += f
        } else if (!mjpeg && id == DB00) {
          require(sz == dibLen,
            s"frame chunk must be $dibLen bytes for ${w}x$h, got $sz")
          val f = new Array[Byte](w * h * 3)
          val base = (off + 8).toInt
          var y = 0
          while (y < h) {
            val src = base + (h - 1 - y) * stride
            var x = 0
            while (x < w) {
              val p = 3 * (y * w + x)
              f(p) = payload(src + 3 * x + 2)     // R
              f(p + 1) = payload(src + 3 * x + 1) // G
              f(p + 2) = payload(src + 3 * x)     // B
              x += 1
            }
            y += 1
          }
          frames += f
        }
        off += 8 + sz + (sz & 1)
      }
    }

    var off = 12L
    while (off + 8 <= end) {
      val id = r.i32(off); val sz = r.u32(off + 4)
      require(off + 8 + sz <= end, s"top-level chunk overruns RIFF at $off")
      if (id == LIST) {
        val listType = r.i32(off + 8)
        if (listType == HDRL) parseHdrl(off + 12, off + 8 + sz)
        else if (listType == MOVI) parseMovi(off + 12, off + 8 + sz)
      }
      off += 8 + sz + (sz & 1)
    }

    require(sawVids && w > 0, "missing stream headers")
    require(frames.nonEmpty, "no video frames in movi list")
    require(totalFrames == frames.length,
      s"header declares $totalFrames frames, movi held ${frames.length}")
    AviVideo(frames.toArray, w, h, fps, if (mjpeg) "MJPG" else "DIB ")
  }
}
