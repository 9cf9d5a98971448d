package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run as partition-parallel typed
  * transforms. The generic [[MediaCodec]] seam ships a deterministic
  * fake so the Spark-side plumbing — schema, encoders, batch shape,
  * partition parallelism — is testable independent of any format, and
  * ALL THREE container legs are now REAL behind it: PNG images via
  * the JDK's `javax.imageio` ([[ImageCodec.PngCodec]], oracle-judged
  * in q323), WAV audio via `javax.sound.sampled` ([[AudioCodec]],
  * q346), and uncompressed-DIB AVI video via a hand-rolled RIFF
  * parser ([[VideoCodec]], q356) — proving the "swapping in a real
  * codec changes one class" claim three times over; an ffmpeg JNI
  * codec for compressed video would slot into the same seam.
  *
  * Scale design: payload bytes never shuffle — decode/featurize are
  * narrow `mapPartitions` transforms; only the small feature vectors
  * and metadata move. At 100 TB the parquet layout should put `payload`
  * in its own column chunk so metadata-only queries never read it
  * (columnar pruning does this for free).
  */
object Multimodal {

  /** One media row: payload + typed metadata (the parquet schema). */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      mime: String,
      width: Int, // image/video; 0 for audio
      height: Int,
      duration_ms: Long, // audio/video; 0 for image
      payload: Array[Byte])

  /** Decoded, fixed-shape feature row (what an embedding model or
    * resize stage would emit).
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      byte_mean: Double, // fake "brightness"
      byte_entropy: Double, // fake "complexity"
      feature: Array[Float]) // fixed FeatureDim-length vector

  val FeatureDim = 16

  /** The decode seam. `decode` turns payload bytes into a feature
    * frame; a real implementation would rasterize/resample here.
    * `decodeBatch` is the vectorized entry point — a real codec
    * overrides it to hand the whole chunk to the accelerator in one
    * call; the default delegates row-wise.
    */
  trait MediaCodec extends Serializable {
    def decode(rec: MediaRecord): MediaFeatures
    def decodeBatch(recs: Seq[MediaRecord]): Seq[MediaFeatures] = recs.map(decode)
  }

  /** Deterministic fake codec: features are byte-histogram statistics —
    * stable across runs/partitionings, so tests can assert exact
    * values. Marks the stubbed boundary described in the module doc.
    */
  object FakeCodec extends MediaCodec {
    def decode(rec: MediaRecord): MediaFeatures = {
      val bytes = rec.payload
      val n = bytes.length
      val counts = new Array[Long](256)
      var sum = 0L
      bytes.foreach { b => val u = b & 0xFF; counts(u) += 1; sum += u }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      val entropy = if (n == 0) 0.0 else {
        var e = 0.0
        counts.foreach { c =>
          if (c > 0) { val p = c.toDouble / n; e -= p * math.log(p) / math.log(2) }
        }
        e
      }
      // 16 coarse histogram buckets, L1-normalized — the fake "embedding"
      val feat = new Array[Float](FeatureDim)
      if (n > 0) {
        var i = 0
        while (i < 256) { feat(i / 16) += counts(i).toFloat / n; i += 1 }
      }
      MediaFeatures(rec.media_id, rec.kind, n,
        math.rint(mean * 10000) / 10000, math.rint(entropy * 10000) / 10000, feat)
    }
  }

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Featurize: the partition-parallel decode pass. One codec instance
    * per partition (real codecs hold native handles); payload bytes are
    * consumed and dropped inside the partition — only features leave.
    */
  def featurize(media: Dataset[MediaRecord], codec: MediaCodec): Dataset[MediaFeatures] =
    media.mapPartitions(rows => rows.map(codec.decode))(mediaFeaturesEnc)

  /** Batched featurize — the shape a vectorized model call needs
    * (mirrors Arrow-batch UDF execution): the partition iterator is
    * chunked, each chunk crosses the codec boundary as ONE
    * `decodeBatch` call, and results stream back without
    * materializing the partition. A real codec overrides
    * `decodeBatch` to hand the whole batch to the accelerator.
    */
  def featurizeBatched(
      media: Dataset[MediaRecord],
      codec: MediaCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] =
    media.mapPartitions(rows =>
      rows.grouped(batchSize).flatMap(codec.decodeBatch))(mediaFeaturesEnc)

  /** Frame-sampling shape for video: emit one synthetic "frame" record
    * every `everyMs` of duration (a real codec would seek+decode). Row
    * explosion happens executor-side; output is (media_id, frame_no,
    * offset_ms).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        val n = (r.duration_ms / everyMs).toInt
        (0 to n).map(i => (r.media_id, i, i * everyMs))
      }
      .toDF("media_id", "frame_no", "offset_ms")
  }

  /** Build a deterministic synthetic media table from the documents
    * table (payload = UTF-8 bytes of the text; kind/mime derived from
    * doc_id) — gives the multimodal path real distributed input without
    * binary fixtures in the repo.
    */
  def syntheticMedia(spark: SparkSession, documentsParquet: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(documentsParquet)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        lit("application/octet-stream").as("mime"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(640)).otherwise(lit(0)).cast("int").as("width"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(480)).otherwise(lit(0)).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) =!= 0, pmod(col("doc_id"), lit(10)) * 1000 + 1000)
          .otherwise(lit(0)).cast("long").as("duration_ms"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
