package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: deflate(text).length /
  * text.length. A classic corpus-curation heuristic (the C4/Gopher
  * filter family, MassiveText's "repetition" rules): machine-generated
  * spam, keyword stuffing, and template boilerplate compress far
  * better than natural prose, so a LOW ratio flags low-quality or
  * near-duplicated content without any reference corpus — one of the
  * cheapest useful per-document scores a 100 TB pipeline can compute.
  *
  * This is a deliberate Scala UDF — the one escape hatch the engine
  * otherwise avoids (see TextFunctions' no-UDF charter) — because
  * DEFLATE fundamentally cannot be a Catalyst expression tree: it is
  * a stateful byte-level LZ77+Huffman coder. Same standing as
  * BloomDedup's bitset probe: a branch-free JVM-local computation with
  * no driver round-trip, applied as a narrow map, so the 100 TB shape
  * (scan-bound, embarrassingly parallel) is unaffected; only
  * whole-stage codegen fusion is lost for this one projection.
  *
  * Determinism: java.util.zip.Deflater at a FIXED level over the
  * UTF-8 bytes is a pure function of the input within a JVM release —
  * stable across partitions, executors, and reruns, which is all the
  * rows-only correctness check and the ordering-based spec need.
  */
object CompressionScore {

  /** Compressed byte count of the UTF-8 encoding, Deflater level 6 —
    * the shared core of [[deflateRatio]] and [[deflateLen]]. Pure
    * function of the input within a JVM release (see header).
    */
  private def deflatedBytes(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes); d.finish()
      // Worst-case deflate expansion is ~5 bytes per 16 KiB block
      // + header; len/10 + 64 covers it for any input.
      val buf = new Array[Byte](bytes.length + bytes.length / 10 + 64)
      var n = 0
      while (!d.finished() && n < buf.length)
        n += d.deflate(buf, n, buf.length - n)
      n
    } finally d.end()
  }

  /** deflate-compressed size / raw size of the UTF-8 bytes, level 6.
    * Empty/null-safe: null → null, "" → 1.0 (incompressible by
    * convention). Ratios can exceed 1 for tiny inputs (header
    * overhead) — callers bucketing "suspiciously compressible" docs
    * only care about the low tail.
    */
  val deflateRatio: UserDefinedFunction = udf((s: String) => {
    if (s == null) null.asInstanceOf[java.lang.Double]
    else {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.isEmpty) java.lang.Double.valueOf(1.0)
      else java.lang.Double.valueOf(
        deflatedBytes(bytes).toDouble / bytes.length)
    }
  })

  /** The INTEGER compressed byte count itself (null → null, "" → the
    * bare zlib wrapper size). q368's judged contract runs on this —
    * integer flags (`z > 0`, `z <= raw + 16`, `z2x < 2z`) have no
    * float boundary for the cross-engine hash to land on, unlike
    * bounds phrased on the ratio (SWEEP.md pattern 4).
    */
  val deflateLenUdf: UserDefinedFunction = udf((s: String) => {
    if (s == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(deflatedBytes(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toLong)
  })

  def ratio(text: Column): Column = deflateRatio(text)

  def deflateLen(text: Column): Column = deflateLenUdf(text)
}
