package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL compressed-image codec backed by the JDK's own `javax.imageio`
  * — no external dependency. This closes the one seam the multimodal
  * trio (q317/q318/q319) left stubbed: those queries prove the
  * byte-level DSP over RAW RGB888 buffers; this class proves the
  * compressed-format decode in front of it, turning the module doc's
  * "swapping in a real codec changes one class" claim
  * (Multimodal.scala) into a tested fact. PNG is LOSSLESS, so an
  * encode→decode round trip reproduces the source buffer bit-for-bit
  * and every downstream exact-integer oracle (the q318 luma histogram)
  * still hash-matches when fed DECODED pixels — the strongest possible
  * evidence the decode is real.
  *
  * Why not a Catalyst Expression: ImageIO is a JDK library call
  * (stream parsing, color management) with nothing to codegen — the
  * same deliberate-boundary argument as the DEFLATE scorer
  * (CompressionScore.scala:37). Payloads decode partition-locally and
  * never shuffle; at 100 TB the decode cost is embarrassingly parallel
  * and the PNG bytes stay in their own parquet column chunk.
  *
  * Pixel transport is TYPE_INT_RGB + setRGB/getRGB: no alpha channel,
  * sRGB both ways, so PNG's lossless contract applies to exactly the
  * 8-bit RGB triplets the RGB888 expressions consume.
  */
object ImageCodec {

  /** Packed RGB888 → TYPE_INT_RGB image (shared by the PNG and JPEG
    * encoders); guards sizes in Long before any Int allocation.
    */
  private def toImage(rgb: Array[Byte], w: Int, h: Int): BufferedImage = {
    require(w > 0 && h > 0, s"dimensions must be positive, got ${w}x$h")
    // Long math before any Int sizing: w*h*3 overflows Int at large
    // dimensions, turning the length check into a wrong-size accept
    // (the same hazard RgbImpl.resizeNearest guards).
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"${w}x$h RGB888 exceeds a JVM array (${w.toLong * h * 3} bytes)")
    require(rgb.length == w * h * 3,
      s"RGB888 payload must be ${w * h * 3} bytes for ${w}x$h, got ${rgb.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = rgb(3 * p) & 0xff
        val g = rgb(3 * p + 1) & 0xff
        val b = rgb(3 * p + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p += 1; x += 1
      }
      y += 1
    }
    img
  }

  /** Encode a packed RGB888 buffer (row-major, 3 bytes/pixel) as PNG. */
  def encodePng(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(toImage(rgb, w, h), "png", bos),
      "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Encode a packed RGB888 buffer as BASELINE JPEG at an explicit
    * quality (the JDK's own writer — deterministic for a given JVM,
    * which is what the MJPEG determinism spec pins). LOSSY: callers
    * judge decoded pixels by tolerance, never equality — the PQ/IVF
    * grading pattern, applied to the codec seam.
    */
  def encodeJpeg(rgb: Array[Byte], w: Int, h: Int,
      quality: Float = 0.9f): Array[Byte] = {
    require(quality > 0f && quality <= 1f, s"quality in (0,1], got $quality")
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(toImage(rgb, w, h), null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG here) back to packed
    * RGB888. Returns the buffer in the same row-major layout
    * `encodePng` consumed.
    */
  def decodeToRgb(payload: Array[Byte]): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    // Decoded dimensions come from the PAYLOAD's header — data-
    // controlled. Long math prevents an Int-overflowed (negative or
    // wrong-size) allocation before the pixel loop writes out-of-
    // bounds (the resizeNearest guard, applied at the decode seam).
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
      s"decoded ${w}x$h exceeds a JVM array (${w.toLong * h * 3} bytes)")
    val out = new Array[Byte](w * h * 3)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        out(3 * p) = ((px >> 16) & 0xff).toByte
        out(3 * p + 1) = ((px >> 8) & 0xff).toByte
        out(3 * p + 2) = (px & 0xff).toByte
        p += 1; x += 1
      }
      y += 1
    }
    out
  }

  /** The [[Multimodal.MediaCodec]] impl the stub seam promised: decodes
    * a compressed image payload with ImageIO, then derives the feature
    * row from the DECODED pixel bytes (same statistics as FakeCodec,
    * but over real pixels, not container bytes — a JPEG/PNG header no
    * longer pollutes the "brightness"). One instance per partition;
    * holds no native state so it is trivially serializable.
    */
  object PngCodec extends Multimodal.MediaCodec {
    def decode(rec: Multimodal.MediaRecord): Multimodal.MediaFeatures = {
      val pixels = decodeToRgb(rec.payload)
      Multimodal.FakeCodec.decode(rec.copy(payload = pixels))
    }
  }
}
