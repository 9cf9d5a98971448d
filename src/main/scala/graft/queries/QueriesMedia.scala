package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: multimodal columns — PCM/RGB byte DSP, PNG/WAV/AVI/MJPEG codecs, media curation pipeline.
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesMedia { this: Queries.type =>

  /** North-star multimodal: typed metadata over binary payload columns.
    * Payload bytes stay executor-side; only per-kind metadata aggregates
    * leave. The byte-size column is oracle-able (octet_length of the
    * source text); decoded features are covered by LlmOpsSpec.
    */
  def q33_media_meta(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.syntheticMedia(s, s"$dir/documents.parquet").toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        sum("duration_ms").as("total_ms"))
      .orderBy("kind")
  }

  /** Multimodal decode through the BATCHED featurize path (q33 covers
    * metadata; this one actually runs `Multimodal.featurizeBatched`'s
    * mapPartitions + chunked `decodeBatch` over every payload —
    * payload bytes never leave the partition, only fixed-shape
    * features). Judged columns are the INTEGER byte statistics the
    * decode emits, which the oracle reproduces as text byte lengths
    * (payload = UTF-8 of the text by construction); the float features
    * stay spec-verified (LlmOpsSpec) where rint-vs-round tie semantics
    * can't leak into a hash compare.
    */
  def q142_media_features(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticMedia(s, s"$dir/documents.parquet")
    Multimodal.featurizeBatched(media, Multimodal.FakeCodec, batchSize = 64)
      .toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        min("n_bytes").as("min_bytes"), max("n_bytes").as("max_bytes"))
      .orderBy("kind")
  }

  /** Multimodal frame-sampling schedule: one row per sampled video
    * frame (every 700 ms of duration) from the synthetic media table,
    * rolled up per asset — the seek-plan a distributed video featurizer
    * executes (the decode itself sits behind Multimodal's codec seam;
    * the SCHEDULE is the Spark-side contract and it is exactly
    * oracle-able because the synthetic duration is arithmetic on
    * doc_id). Row explosion happens executor-side in the typed
    * Dataset path; payload bytes never enter the frame frame.
    */
  def q243_frame_sampling(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.sampleFrames(
        Multimodal.syntheticMedia(s, s"$dir/documents.parquet"), everyMs = 700L)
      .filter(col("media_id") < 60)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        max(col("offset_ms")).cast("long").as("last_offset_ms"))
      .orderBy("media_id")
  }

  /** Weighted median per group: the retail price at which half the
    * BRAND'S TOTAL SIZE UNITS sit below — inventory-weighted central
    * price, the robust location estimate when rows carry unequal mass
    * (plain median treats a size-1 and size-50 part alike). First
    * value whose cumulative weight reaches ⌈W/2⌉, in exact integers:
    * per-brand sort windows over the DIMENSION-sized part table (at
    * any corpus scale parts stay dimension-sized; fact-grain weighted
    * medians would route through Quantiles' two-pass buckets instead).
    */
  def q253_weighted_median(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("cents"),
        col("p_size").cast("long").as("w"))
    val win = Window.partitionBy("p_brand").orderBy(col("cents").asc, col("p_partkey").asc)
    val tot = p.groupBy("p_brand").agg(sum("w").as("tw"), count(lit(1)).as("n_parts"))
    p.withColumn("cw", sum("w").over(win.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(tot), "p_brand")
      .filter(col("cw") * 2 >= col("tw")) // first row reaching ⌈W/2⌉ …
      .withColumn("rk", row_number().over(
        Window.partitionBy("p_brand").orderBy(col("cents").asc, col("p_partkey").asc)))
      .filter(col("rk") === 1)
      .select(col("p_brand"), col("n_parts"), col("tw").as("total_weight"),
        round(col("cents") / lit(100.0), 2).as("weighted_median_price"))
      .orderBy("p_brand")
  }

  /** Mood's median test: do weekday and weekend purchase values
    * straddle the POOLED median differently — the coarsest, most
    * outlier-proof two-sample test (only the side of the median
    * matters), closing the nonparametric kit next to q261's
    * rank-sum and q206's KS. The median is an actual data value
    * picked by exact rank (q269's rule, 1-row broadcast); the 2×2
    * above/below table is exact integers and the chi-square is
    * q126's single-division N(ad−bc)²/(row·col products) form —
    * engine-identical until one rounding. Ties at the median count
    * as "not above" (the standard convention, documented here
    * because it changes the table).
    *
    * The pooled rank is PrefixSum.globalRank on (value, event_id) —
    * the FACT-grain ordering must never plan a single-partition
    * window (it would move every purchase event to one task); the
    * cost-based two-pass rank keeps it partition-parallel at scale
    * while the (unique) tuple keeps the median pick deterministic.
    */
  def q295_mood_median(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"),
        dayofweek(col("ts")).isin(1, 7).as("wk"))
    val ranked = PrefixSum.globalRank(p, Seq("value", "event_id"), "r")
    val med = ranked
      .crossJoin(broadcast(p.agg(count(lit(1)).as("nn"))))
      .filter(col("r") === floor((col("nn") + 1) / 2.0))
      .select(col("value").as("med"))
    val cells = p.crossJoin(broadcast(med))
      .agg(
        sum(when(!col("wk") && col("value") > col("med"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("wk") && col("value") <= col("med"), 1L).otherwise(0L)).as("b"),
        sum(when(col("wk") && col("value") > col("med"), 1L).otherwise(0L)).as("c"),
        sum(when(col("wk") && col("value") <= col("med"), 1L).otherwise(0L)).as("d"))
    val n = col("a") + col("b") + col("c") + col("d")
    val det = col("a") * col("d") - col("b") * col("c")
    cells.select(col("a").as("wd_above"), col("b").as("wd_below"),
      col("c").as("we_above"), col("d").as("we_below"),
      round(n * det * det /
        ((col("a") + col("b")) * (col("c") + col("d")) *
          (col("a") + col("c")) * (col("b") + col("d"))).cast("double"), 4)
        .as("chi2"))
  }

  /** REAL audio DSP through opaque binary columns — the multimodal
    * path that needs no external codec and so is NOT stubbed (q33/
    * q142/q243 exercise the stubbed image/video decode seam): 16-bit
    * PCM tones are synthesized from per-id arithmetic, PACKED into
    * little-endian int16 payload bytes (`PcmPack`), and per-frame RMS
    * energy plus silence detection is computed back FROM THE BYTES
    * (`PcmFrameRms`, a codegen byte loop) — the voice-activity /
    * silence-trim primitive of audio curation. The oracle reproduces
    * the same sample arithmetic in SQL without any binary, so hash
    * equality proves the pack→bytes→RMS path lossless. Payloads never
    * shuffle; only the 10-double energy arrays move.
    */
  def q317_audio_energy(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.PcmExpressions._
    val amp = when(col("media_id") % 5 === 0, lit(0.0))
      .otherwise(lit(2000.0) + col("media_id") * 100)
    val w = ((col("media_id") % 7) + 1) * lit(0.01)
    val samples = transform(sequence(lit(0), lit(2399)),
      t => floor(amp * sin(t.cast("double") * w)).cast("long"))
    val rms = s.range(1, 21).toDF("media_id")
      .withColumn("payload", pcmPack(samples))
      .withColumn("rms", pcmFrameRms(col("payload"), 240))
    rms.select(col("media_id"),
        size(col("rms")).cast("long").as("n_frames"),
        round(aggregate(col("rms"), lit(0.0), (a, x) => a + x) / size(col("rms")), 4)
          .as("mean_rms"),
        round(array_max(col("rms")), 4).as("peak_rms"),
        size(filter(col("rms"), x => x < 1.0)).cast("long").as("silence_frames"))
      .orderBy("media_id")
  }

  /** q317's image twin: REAL raw-bitmap ops over binary columns —
    * RGB888 buffers synthesized from per-id arithmetic, then integer
    * BT.601 luma histogram ((77r+150g+29b)>>8, 8 bins) and a 4×4
    * nearest-neighbor thumbnail computed FROM THE BYTES by codegen
    * loops (`RgbLumaHist`/`RgbResizeNearest`/`RgbLumaSum`). Every
    * output is exact integer arithmetic, so the binary-free DuckDB
    * oracle matches bit-for-bit — the brightness-profile / thumbnail
    * primitives of image curation, minus only the compressed-format
    * decode this container cannot host (that seam stays stubbed in
    * operators/Multimodal.scala).
    */
  def q318_image_stats(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.RgbExpressions._
    val bytes = transform(sequence(lit(0), lit(575)),
      i => (col("media_id") * 31 + i.cast("long") * 7) % 256)
    val df = s.range(1, 13).toDF("media_id")
      .withColumn("payload", bytesPack(bytes))
      .withColumn("hist", rgbLumaHist(col("payload"), 8))
      .withColumn("thumb", rgbResizeNearest(col("payload"), 16, 12, 4, 4))
    val histCols = (0 until 8).map(b =>
      element_at(col("hist"), b + 1).as(s"h$b"))
    df.select(col("media_id") +: histCols :+
        round(rgbLumaSum(col("thumb")) / lit(16.0), 4).as("thumb_mean_luma"): _*)
      .orderBy("media_id")
  }

  /** The video leg of the codec-free multimodal trio (q317 audio,
    * q318 image): raw concatenated RGB frames synthesized with a
    * scene cut at frame 3, per-boundary motion energy Σ|Δbyte|
    * computed FROM THE BYTES by the codegen `RgbMotion` loop — the
    * scene-cut / static-clip detector video curation runs before
    * sampling frames for a vision model. Exact integers end to end;
    * the binary-free oracle reproduces the arithmetic, proving the
    * byte path. In-scene boundaries drift by 1/byte (motion ~144 per
    * 144-byte frame pair — though the mod-256 arithmetic can WRAP a
    * byte across a frame step, |Δ| = 255 instead of 1, so an in-scene
    * boundary is bounded by 143 + 255, still well under the 1000 cut
    * threshold) while the cut jumps two orders — the threshold flags
    * exactly one cut per clip.
    */
  def q319_video_motion(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.RgbExpressions._
    val frameBytes = 144
    val bytes = transform(sequence(lit(0), lit(863)), i => {
      val il = i.cast("long")
      val f = floor(i.cast("double") / frameBytes).cast("long")
      val j = il % frameBytes
      (col("media_id") * 13 + j * 5 + f +
        when(f >= 3, (j % 3 + 1) * 100).otherwise(0)) % 256
    })
    val m = s.range(1, 9).toDF("media_id")
      .withColumn("motion", rgbMotion(bytesPack(bytes), frameBytes))
    m.select(col("media_id"),
        size(col("motion")).cast("long").as("n_boundaries"),
        aggregate(col("motion"), lit(0L), (a, x) => a + x).as("total_motion"),
        array_max(col("motion")).as("max_motion"),
        size(filter(col("motion"), x => x > 1000L)).cast("long").as("n_cuts"))
      .orderBy("media_id")
  }

  /** End-to-end MEDIA curation pipeline (the multimodal q158): 40
    * synthetic clips each carry an audio payload, a raw video payload,
    * and a keyframe bitmap — all real bytes — and the pipeline drops
    * silent clips (q317's frame-RMS gate: the silent generator emits
    * exact zeros), drops static clips (q319's motion gate: identical
    * frames give motion exactly 0), then exact-dedups the SURVIVORS on
    * a composite perceptual key — keyframe-thumbnail luma sum PLUS the
    * full-frame 8-bin luma histogram packed base-193 into one long
    * (q318's resize/sum/hist; the thumbnail sum alone collides across
    * distinct content — vids 3 and 19 here — exactly why real
    * perceptual fingerprints combine a global profile with a
    * downsample) — clips share visual content per id%20, so cross-id
    * duplicates exist by construction; the smallest id is kept. Every stage is
    * byte-level arithmetic the binary-free oracle reproduces, so the
    * full verdict column is hash-exact. A partner dropped as
    * silent/static does NOT shadow its duplicate — dedup runs over
    * survivors only, the order every real pipeline uses (cheap gates
    * before the keyed shuffle). The dedup shuffle carries an 8-byte
    * key; payloads never leave their map side.
    */
  def q322_media_pipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.PcmExpressions._
    import graft.expr.RgbExpressions._
    val vid = col("media_id") % 20
    // Audio: 1200 samples; ids ≡ 0 (mod 4) are digital silence.
    val amp = when(col("media_id") % 4 === 0, lit(0.0))
      .otherwise(lit(2100.0) + col("media_id") * 50)
    val w = ((col("media_id") % 7) + 1) * lit(0.01)
    val audio = transform(sequence(lit(0), lit(1199)),
      t => floor(amp * sin(t.cast("double") * w)).cast("long"))
    // Video: 4 frames x 48 bytes; ids ≡ 0 (mod 5) freeze the frame.
    val video = transform(sequence(lit(0), lit(191)), i => {
      val f = floor(i.cast("double") / 48).cast("long")
      val j = i.cast("long") % 48
      (vid * 9 + j * 3 +
        when(col("media_id") % 5 === 0, lit(0L)).otherwise(f * 7)) % 256
    })
    // Keyframe: 16x12 RGB888 seeded by id % 20 (the duplicate axis).
    val keyframe = transform(sequence(lit(0), lit(575)),
      i => (vid * 31 + i.cast("long") * 7) % 256)
    // 193 > max bin count (192), so the packed histogram is injective;
    // 193^7 * 192 fits a long.
    val p193 = Array.iterate(1L, 8)(_ * 193L)
    val base = s.range(1, 41).toDF("media_id")
      .withColumn("silent",
        array_max(pcmFrameRms(pcmPack(audio), 240)) < 1.0)
      .withColumn("static",
        array_max(rgbMotion(bytesPack(video), 48)) < 10L)
      .withColumn("kf", bytesPack(keyframe))
      .withColumn("thumb_key",
        rgbLumaSum(rgbResizeNearest(col("kf"), 16, 12, 4, 4)))
      .withColumn("hist", rgbLumaHist(col("kf"), 8))
      .withColumn("hist_key",
        (0 until 8).map(b => element_at(col("hist"), b + 1) * lit(p193(b)))
          .reduce(_ + _))
      .drop("kf", "hist")
    val keepers = base.filter(!col("silent") && !col("static"))
      .groupBy("thumb_key", "hist_key").agg(min("media_id").as("keeper"))
    base.join(broadcast(keepers), Seq("thumb_key", "hist_key"), "left")
      .select(col("media_id"), col("thumb_key"), col("hist_key"),
        when(col("silent"), "silent")
          .when(col("static"), "static")
          .when(col("media_id") === col("keeper"), "kept")
          .otherwise("duplicate").as("status"))
      .orderBy("media_id")
  }

  /** The REAL compressed-image decode the multimodal trio still
    * stubbed: q318's synthetic 16×12 RGB888 bitmaps are encoded to
    * actual PNG bytes and decoded back through the JDK's
    * `javax.imageio` ([[graft.operators.ImageCodec]]), and the BT.601
    * luma histogram is re-derived FROM THE DECODED PIXELS by the same
    * codegen `RgbLumaHist` loop. PNG is lossless, so the binary-free
    * DuckDB oracle (identical arithmetic to q318's) hash-matches bit
    * for bit — if the codec fabricated or shifted even one byte, the
    * histogram (and the projected `lossless` flag comparing decoded
    * to source bytes) would break. Encode/decode are deliberate UDFs
    * (a JDK library-call boundary with nothing to codegen —
    * CompressionScore's documented pattern); payloads decode
    * partition-locally and never shuffle.
    */
  def q323_png_decode(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.RgbExpressions._
    import graft.operators.ImageCodec
    val encodeUdf = udf((rgb: Array[Byte]) => ImageCodec.encodePng(rgb, 16, 12))
    val decodeUdf = udf((png: Array[Byte]) => ImageCodec.decodeToRgb(png))
    val bytes = transform(sequence(lit(0), lit(575)),
      i => (col("media_id") * 31 + i.cast("long") * 7) % 256)
    val df = s.range(1, 13).toDF("media_id")
      .withColumn("rgb", bytesPack(bytes))
      .withColumn("png", encodeUdf(col("rgb")))
      .withColumn("decoded", decodeUdf(col("png")))
      .withColumn("hist", rgbLumaHist(col("decoded"), 8))
    val histCols = (0 until 8).map(b =>
      element_at(col("hist"), b + 1).as(s"h$b"))
    df.select(col("media_id") +: histCols :+
        (col("decoded") === col("rgb")).as("lossless"): _*)
      .orderBy("media_id")
  }

  /** The WAV-CONTAINER leg of the multimodal codec seam — q323's PNG
    * precedent applied to audio through the JDK's `javax.sound.sampled`
    * ([[graft.operators.AudioCodec]]): q317's synthetic PCM16 tones are
    * wrapped into REAL RIFF/WAVE bytes, parsed back (payload bytes PLUS
    * the header's sample-rate/channel metadata), and the per-frame RMS
    * battery is re-derived FROM THE DECODED bytes by the same codegen
    * `PcmFrameRms` loop. WAV PCM is a lossless container, so the
    * binary-free DuckDB oracle (q317's arithmetic + the header
    * constants) hash-matches bit for bit — and the projected
    * `lossless` flag compares decoded to source bytes directly, so a
    * codec that shifted or fabricated even one byte breaks BOTH
    * columns. Encode/decode are deliberate UDFs (a JDK library-call
    * boundary with nothing to codegen — q323/CompressionScore's
    * documented pattern); payloads decode partition-locally and never
    * shuffle. The video container leg closes the same way in
    * q356_avi_decode (hand-rolled RIFF/AVI, operators/VideoCodec).
    */
  def q346_wav_decode(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.PcmExpressions._
    import graft.operators.AudioCodec
    val encodeUdf = udf((pcm: Array[Byte]) => AudioCodec.encodeWav(pcm, 16000, 1))
    val decodeUdf = udf((wav: Array[Byte]) => {
      val a = AudioCodec.decodeWav(wav)
      (a.pcm, a.sampleRate, a.channels)
    })
    val amp = when(col("media_id") % 5 === 0, lit(0.0))
      .otherwise(lit(2000.0) + col("media_id") * 100)
    val w = ((col("media_id") % 7) + 1) * lit(0.01)
    val samples = transform(sequence(lit(0), lit(2399)),
      t => floor(amp * sin(t.cast("double") * w)).cast("long"))
    val df = s.range(1, 21).toDF("media_id")
      .withColumn("pcm", pcmPack(samples))
      .withColumn("wav", encodeUdf(col("pcm")))
      .withColumn("dec", decodeUdf(col("wav")))
      .withColumn("rms", pcmFrameRms(col("dec._1"), 240))
    df.select(col("media_id"),
        col("dec._2").cast("long").as("sample_rate"),
        col("dec._3").cast("long").as("channels"),
        size(col("rms")).cast("long").as("n_frames"),
        round(aggregate(col("rms"), lit(0.0), (a, x) => a + x) / size(col("rms")), 4)
          .as("mean_rms"),
        round(array_max(col("rms")), 4).as("peak_rms"),
        size(filter(col("rms"), x => x < 1.0)).cast("long").as("silence_frames"),
        (col("dec._1") === col("pcm")).as("lossless"))
      .orderBy("media_id")
  }

  /** The VIDEO-CONTAINER leg of the multimodal codec seam — the last
    * of the trio (q323 PNG via javax.imageio, q346 WAV via
    * javax.sound.sampled): q319's synthetic scene-cut clips are
    * wrapped into REAL RIFF/AVI bytes (uncompressed 24-bit `DIB `
    * stream, standard hdrl/movi/idx1 layout — a hand-rolled JDK-only
    * writer/parser, [[graft.operators.VideoCodec]]), parsed back
    * (frame payloads PLUS the header's width/height/fps/frame-count
    * metadata), and the motion-energy + luma batteries are re-derived
    * FROM THE DECODED bytes by the same codegen `RgbMotion` /
    * `RgbLumaSum` loops. Uncompressed DIB is a lossless byte
    * permutation (bottom-up BGR padded rows), so the binary-free
    * DuckDB oracle (q319's arithmetic + the header constants)
    * hash-matches bit for bit — and the projected `lossless` flag
    * compares decoded to source bytes directly, so a codec that
    * shifted, re-padded, or fabricated even one byte breaks BOTH
    * columns. Encode/decode are deliberate UDFs (byte-stream parsing,
    * nothing to codegen — q323/q346's documented pattern); payloads
    * decode partition-locally and never shuffle.
    */
  def q356_avi_decode(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.RgbExpressions._
    import graft.operators.VideoCodec
    val w = 6; val h = 4; val frameBytes = w * h * 3 // 72
    val encodeUdf = udf((frames: Seq[Array[Byte]], fps: Int) =>
      VideoCodec.encodeAvi(frames, w, h, fps))
    val decodeUdf = udf((avi: Array[Byte]) => {
      val v = VideoCodec.decodeAvi(avi)
      (v.frames.reduce(_ ++ _), v.width, v.height, v.fps, v.frames.length)
    })
    // q319's generator at 4 frames x 72 bytes with the scene cut at
    // frame 2: in-scene boundaries drift by ~1/byte, the cut jumps two
    // orders — same threshold argument as q319's module doc.
    def frameBytesCol(f: Int) = bytesPack(
      transform(sequence(lit(0), lit(frameBytes - 1)), j => {
        val jl = j.cast("long")
        (col("media_id") * 13 + jl * 5 + lit(f.toLong) +
          (if (f >= 2) (jl % 3 + 1) * 100 else lit(0L))) % 256
      }))
    val df = s.range(1, 11).toDF("media_id")
      .withColumn("fps", ((col("media_id") % 3 + 1) * 10).cast("int"))
      .withColumn("fr", array((0 until 4).map(frameBytesCol): _*))
      .withColumn("src", concat((0 until 4).map(i =>
        element_at(col("fr"), i + 1)): _*))
      .withColumn("avi", encodeUdf(col("fr"), col("fps")))
      .withColumn("dec", decodeUdf(col("avi")))
      .withColumn("motion", rgbMotion(col("dec._1"), frameBytes))
    df.select(col("media_id"),
        col("dec._2").cast("long").as("width"),
        col("dec._3").cast("long").as("height"),
        col("dec._4").cast("long").as("fps_hdr"),
        col("dec._5").cast("long").as("n_frames"),
        size(col("motion")).cast("long").as("n_boundaries"),
        aggregate(col("motion"), lit(0L), (a, x) => a + x).as("total_motion"),
        array_max(col("motion")).as("max_motion"),
        size(filter(col("motion"), x => x > 1000L)).cast("long").as("n_cuts"),
        rgbLumaSum(col("dec._1")).as("luma_sum"),
        (col("dec._1") === col("src")).as("lossless"))
      .orderBy("media_id")
  }

  /** COMPRESSED video without ffmpeg: MJPEG-in-AVI (q365), closing the
    * last multimodal seam the environment left open. Smooth synthetic
    * clips (triangle-wave gradients — continuous content, the class
    * MJPEG's DCT compresses well with bounded error) are encoded as
    * real RIFF/AVI `MJPG` streams — every frame an independent
    * baseline JPEG from the JDK's own ImageIO writer
    * ([[graft.operators.VideoCodec.encodeAviMjpeg]]) — then parsed and
    * JPEG-decoded back. JPEG is LOSSY, so this is judged like the
    * PQ/IVF family: header metadata (dims, fps, frame count, codec
    * tag) is exact and oracle-checked per row; the decoded pixels are
    * judged by BOUNDS the construction guarantees — lossy (error > 0),
    * within tolerance (max |decoded−source| ≤ 48; measured 25-35 on
    * this content class), and actually compressed (container under
    * half the raw pixel bytes; measured ~4x) — with the byte-exact
    * encode determinism and torn-stream rejection pinned in
    * VideoCodecSpec. Encode/decode are the documented UDF boundary
    * (q323/q346/q356's pattern); payloads stay partition-local. At
    * 100 TB, MJPEG's every-frame-a-keyframe profile is what makes
    * frame sampling chunk-local — no inter-frame state ever crosses
    * rows.
    */
  def q365_mjpeg_avi(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.RgbExpressions._
    import graft.operators.VideoCodec
    val w = 48; val h = 32; val frameBytes = w * h * 3
    val encodeUdf = udf((frames: Seq[Array[Byte]], fps: Int) =>
      VideoCodec.encodeAviMjpeg(frames, w, h, fps))
    val decodeUdf = udf((avi: Array[Byte], src: Array[Byte]) => {
      val v = VideoCodec.decodeAvi(avi)
      val dec = v.frames.reduce(_ ++ _)
      require(dec.length == src.length,
        s"decoded ${dec.length} bytes vs ${src.length} source")
      var maxErr = 0
      var i = 0
      while (i < dec.length) {
        val e = math.abs((dec(i) & 0xff) - (src(i) & 0xff))
        if (e > maxErr) maxErr = e
        i += 1
      }
      (v.width, v.height, v.fps, v.frames.length, v.codec, maxErr)
    })
    def frameCol(f: Int) = bytesPack(
      transform(sequence(lit(0), lit(frameBytes - 1)), j => {
        val jl = j.cast("long")
        val p = ((jl - pmod(jl, lit(3))) / 3).cast("long")
        val c = pmod(jl, lit(3))
        val x = pmod(p, lit(w))
        val y = ((p - x) / w).cast("long")
        val t = pmod(x * 3 + y * 5 + lit(f.toLong * 7) + c * 11 + col("media_id"),
          lit(510))
        when(t > 255, lit(510L) - t).otherwise(t)
      }))
    val df = s.range(1, 11).toDF("media_id")
      .withColumn("fps", ((col("media_id") % 3 + 1) * 10).cast("int"))
      .withColumn("fr", array((0 until 4).map(frameCol): _*))
      .withColumn("src", concat((0 until 4).map(i =>
        element_at(col("fr"), i + 1)): _*))
      .withColumn("avi", encodeUdf(col("fr"), col("fps")))
      .withColumn("dec", decodeUdf(col("avi"), col("src")))
    df.select(col("media_id"),
        col("dec._1").cast("long").as("width"),
        col("dec._2").cast("long").as("height"),
        col("dec._3").cast("long").as("fps_hdr"),
        col("dec._4").cast("long").as("n_frames"),
        col("dec._5").as("codec"),
        (col("dec._6") > 0).as("lossy"),
        (col("dec._6") <= 48).as("within_tol"),
        (octet_length(col("avi")) * 2 < lit(4 * frameBytes)).as("compressed"))
      .orderBy("media_id")
  }

  private[graft] def mediaAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_media_meta"    -> (q33_media_meta _),
    "q142_media_features" -> (q142_media_features _),
    "q243_frame_sampling" -> (q243_frame_sampling _),
    "q253_weighted_median" -> (q253_weighted_median _),
    "q295_mood_median"  -> (q295_mood_median _),
    "q317_audio_energy" -> (q317_audio_energy _),
    "q318_image_stats" -> (q318_image_stats _),
    "q319_video_motion" -> (q319_video_motion _),
    "q322_media_pipeline" -> (q322_media_pipeline _),
    "q323_png_decode" -> (q323_png_decode _),
    "q346_wav_decode" -> (q346_wav_decode _),
    "q356_avi_decode" -> (q356_avi_decode _),
    "q365_mjpeg_avi"    -> (q365_mjpeg_avi _),
  )

  private[graft] def mediaOracle: Map[String, String] = Map(
    "q365_mjpeg_avi" ->
      // The PQ-family grading: metadata columns recompute the exact
      // construction (fps grid, dims, frame count); the codec-derived
      // booleans are construction-guaranteed bounds the Spark side
      // MEASURES (JPEG error ≤ 48, container < raw/2) — the oracle
      // asserts they hold, VideoCodecSpec pins the determinism.
      """SELECT id AS media_id, 48::BIGINT AS width, 32::BIGINT AS height,
        |  ((id % 3) + 1) * 10 AS fps_hdr, 4::BIGINT AS n_frames,
        |  'MJPG' AS codec, TRUE AS lossy, TRUE AS within_tol,
        |  TRUE AS compressed
        |FROM range(1, 11) t(id) ORDER BY media_id""".stripMargin,
    "q33_media_meta" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  count(*) AS n,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN doc_id % 10 * 1000 + 1000 ELSE 0 END) AS BIGINT) AS total_ms
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    "q142_media_features" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |  ELSE 'video' END AS kind,
        |  count(*) AS n, sum(strlen(text))::BIGINT AS total_bytes,
        |  min(strlen(text))::BIGINT AS min_bytes,
        |  max(strlen(text))::BIGINT AS max_bytes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    "q243_frame_sampling" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, (doc_id % 10) * 1000 + 1000 AS dur
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id,
        |    unnest(range(0, (dur // 700)::BIGINT + 1)) AS i
        |  FROM v)
        |SELECT media_id, count(*)::BIGINT AS n_frames,
        |  max(i * 700)::BIGINT AS last_offset_ms
        |FROM f WHERE media_id < 60
        |GROUP BY media_id ORDER BY media_id""".stripMargin,
    "q253_weighted_median" ->
      """WITH p AS (SELECT p_brand, p_partkey,
        |    round(p_retailprice * 100, 0)::BIGINT AS cents,
        |    p_size::BIGINT AS w FROM part),
        |tot AS (SELECT p_brand, sum(w)::BIGINT AS tw, count(*)::BIGINT AS n_parts
        |        FROM p GROUP BY p_brand),
        |c AS (SELECT p.p_brand, cents, tw, n_parts,
        |    sum(w) OVER (PARTITION BY p.p_brand ORDER BY cents, p_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    p_partkey
        |  FROM p JOIN tot ON tot.p_brand = p.p_brand),
        |hit AS (SELECT *, row_number() OVER (PARTITION BY p_brand
        |      ORDER BY cents, p_partkey) AS rk
        |  FROM c WHERE cw * 2 >= tw)
        |SELECT p_brand, n_parts, tw AS total_weight,
        |  round(cents / 100.0, 2) AS weighted_median_price
        |FROM hit WHERE rk = 1 ORDER BY p_brand""".stripMargin,
    "q295_mood_median" ->
      """WITH p AS (SELECT event_id, value,
        |    dayofweek(ts) IN (0, 6) AS wk FROM events
        |  WHERE event_type = 'purchase'),
        |ranked AS (SELECT *, row_number() OVER (ORDER BY value, event_id)::BIGINT
        |    AS r FROM p),
        |nn AS (SELECT count(*)::BIGINT AS nn FROM p),
        |med AS (SELECT value AS med FROM ranked, nn
        |  WHERE r = floor((nn + 1) / 2.0)),
        |cells AS (SELECT
        |    sum(CASE WHEN NOT wk AND value > med THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN NOT wk AND value <= med THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN wk AND value > med THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN wk AND value <= med THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM p, med)
        |SELECT a AS wd_above, b AS wd_below, c AS we_above, d AS we_below,
        |  round((a + b + c + d) * (a * d - b * c) * (a * d - b * c) /
        |    ((a + b) * (c + d) * (a + c) * (b + d))::DOUBLE, 4) AS chi2
        |FROM cells""".stripMargin,
    "q317_audio_energy" ->
      """WITH m AS (SELECT id AS media_id,
        |    CASE WHEN id % 5 = 0 THEN 0.0 ELSE 2000.0 + id * 100 END AS amp,
        |    ((id % 7) + 1) * 0.01 AS w
        |  FROM range(1, 21) t(id)),
        |s AS (SELECT media_id, (t.t // 240)::BIGINT AS f,
        |    floor(amp * sin(t.t * w)) AS v
        |  FROM m, range(0, 2400) t(t)),
        |fr AS (SELECT media_id, f, sqrt(avg(v * v)) AS rms
        |  FROM s GROUP BY 1, 2)
        |SELECT media_id, count(*)::BIGINT AS n_frames,
        |  round(avg(rms), 4) AS mean_rms,
        |  round(max(rms), 4) AS peak_rms,
        |  sum(CASE WHEN rms < 1.0 THEN 1 ELSE 0 END)::BIGINT AS silence_frames
        |FROM fr GROUP BY 1 ORDER BY media_id""".stripMargin,
    "q318_image_stats" ->
      """WITH im AS (SELECT id AS media_id FROM range(1, 13) t(id)),
        |px AS (SELECT media_id, p.p AS p,
        |    ((77 * ((media_id*31 + (3*p.p)*7) % 256)
        |    + 150 * ((media_id*31 + (3*p.p+1)*7) % 256)
        |    + 29 * ((media_id*31 + (3*p.p+2)*7) % 256)) // 256) AS y
        |  FROM im, range(0, 192) p(p)),
        |h AS (SELECT media_id,
        |    sum(CASE WHEN y // 32 = 0 THEN 1 ELSE 0 END)::BIGINT AS h0,
        |    sum(CASE WHEN y // 32 = 1 THEN 1 ELSE 0 END)::BIGINT AS h1,
        |    sum(CASE WHEN y // 32 = 2 THEN 1 ELSE 0 END)::BIGINT AS h2,
        |    sum(CASE WHEN y // 32 = 3 THEN 1 ELSE 0 END)::BIGINT AS h3,
        |    sum(CASE WHEN y // 32 = 4 THEN 1 ELSE 0 END)::BIGINT AS h4,
        |    sum(CASE WHEN y // 32 = 5 THEN 1 ELSE 0 END)::BIGINT AS h5,
        |    sum(CASE WHEN y // 32 = 6 THEN 1 ELSE 0 END)::BIGINT AS h6,
        |    sum(CASE WHEN y // 32 = 7 THEN 1 ELSE 0 END)::BIGINT AS h7
        |  FROM px GROUP BY 1),
        |tp AS (SELECT (y2.y * 3 * 16 + x2.x * 4) AS p
        |  FROM range(0, 4) y2(y), range(0, 4) x2(x)),
        |th AS (SELECT media_id, round(sum(y) / 16.0, 4) AS thumb_mean_luma
        |  FROM px JOIN tp USING (p) GROUP BY 1)
        |SELECT h.media_id, h0, h1, h2, h3, h4, h5, h6, h7, th.thumb_mean_luma
        |FROM h JOIN th ON h.media_id = th.media_id
        |ORDER BY h.media_id""".stripMargin,
    "q319_video_motion" ->
      """WITH v AS (SELECT id AS media_id, i.i AS i,
        |    (id*13 + (i.i % 144)*5 + (i.i // 144)
        |     + CASE WHEN i.i // 144 >= 3
        |            THEN ((i.i % 144) % 3 + 1) * 100 ELSE 0 END) % 256 AS v
        |  FROM range(1, 9) t(id), range(0, 864) i(i)),
        |d AS (SELECT a.media_id, (a.i // 144) AS b,
        |    sum(abs(a.v - bb.v))::BIGINT AS motion
        |  FROM v a JOIN v bb
        |    ON a.media_id = bb.media_id AND bb.i = a.i + 144
        |  GROUP BY 1, 2)
        |SELECT media_id, count(*)::BIGINT AS n_boundaries,
        |  sum(motion)::BIGINT AS total_motion,
        |  max(motion)::BIGINT AS max_motion,
        |  sum(CASE WHEN motion > 1000 THEN 1 ELSE 0 END)::BIGINT AS n_cuts
        |FROM d GROUP BY 1 ORDER BY media_id""".stripMargin,
    "q322_media_pipeline" ->
      """WITH m AS (SELECT id AS media_id, id % 20 AS vid FROM range(1, 41) t(id)),
        |asamp AS (SELECT media_id, t.t AS t,
        |    floor((CASE WHEN media_id % 4 = 0 THEN 0.0
        |                ELSE 2100.0 + media_id * 50 END)
        |          * sin(t.t * ((media_id % 7) + 1) * 0.01)) AS v
        |  FROM m, range(0, 1200) t(t)),
        |arms AS (SELECT media_id, (t // 240) AS f, sqrt(avg(v * v)) AS r
        |  FROM asamp GROUP BY 1, 2),
        |au AS (SELECT media_id, max(r) AS max_rms FROM arms GROUP BY 1),
        |vbyte AS (SELECT media_id, (i.i // 48) AS f, (i.i % 48) AS j,
        |    (vid * 9 + (i.i % 48) * 3 +
        |     CASE WHEN media_id % 5 = 0 THEN 0 ELSE (i.i // 48) * 7 END) % 256 AS v
        |  FROM m, range(0, 192) i(i)),
        |mot AS (SELECT a.media_id, a.f AS b, sum(abs(b2.v - a.v)) AS motion
        |  FROM vbyte a JOIN vbyte b2
        |    ON a.media_id = b2.media_id AND b2.f = a.f + 1 AND b2.j = a.j
        |  GROUP BY 1, 2),
        |vi AS (SELECT media_id, max(motion) AS max_motion FROM mot GROUP BY 1),
        |tp AS (SELECT (y2.y * 3 * 16 + x2.x * 4) AS p
        |  FROM range(0, 4) y2(y), range(0, 4) x2(x)),
        |ky AS (SELECT m.media_id,
        |    sum((77 * ((vid*31 + (3*tp.p)*7) % 256)
        |       + 150 * ((vid*31 + (3*tp.p+1)*7) % 256)
        |       + 29 * ((vid*31 + (3*tp.p+2)*7) % 256)) // 256)::BIGINT AS thumb_key
        |  FROM m, tp GROUP BY 1),
        |lum AS (SELECT media_id,
        |    ((77 * ((vid*31 + (3*i.i)*7) % 256)
        |     + 150 * ((vid*31 + (3*i.i+1)*7) % 256)
        |     + 29 * ((vid*31 + (3*i.i+2)*7) % 256)) // 256) // 32 AS b
        |  FROM m, range(0, 192) i(i)),
        |hk AS (SELECT media_id,
        |    sum(CASE b WHEN 0 THEN 1 WHEN 1 THEN 193 WHEN 2 THEN 37249
        |        WHEN 3 THEN 7189057 WHEN 4 THEN 1387488001
        |        WHEN 5 THEN 267785184193 WHEN 6 THEN 51682540549249
        |        ELSE 9974730326005057 END)::BIGINT AS hist_key
        |  FROM lum GROUP BY 1),
        |fl AS (SELECT m.media_id, ky.thumb_key, hk.hist_key,
        |    (au.max_rms < 1.0) AS silent, (vi.max_motion < 10) AS is_static
        |  FROM m JOIN au USING (media_id) JOIN vi USING (media_id)
        |    JOIN ky USING (media_id) JOIN hk USING (media_id)),
        |kp AS (SELECT thumb_key, hist_key, min(media_id) AS keeper FROM fl
        |  WHERE NOT silent AND NOT is_static GROUP BY 1, 2)
        |SELECT fl.media_id, fl.thumb_key, fl.hist_key,
        |  CASE WHEN fl.silent THEN 'silent'
        |       WHEN fl.is_static THEN 'static'
        |       WHEN fl.media_id = kp.keeper THEN 'kept'
        |       ELSE 'duplicate' END AS status
        |FROM fl LEFT JOIN kp USING (thumb_key, hist_key)
        |ORDER BY fl.media_id""".stripMargin,
    // q318's histogram arithmetic verbatim — the engine side computes it
    // from PNG-DECODED pixels, so a hash match proves the JDK codec
    // round-trips losslessly; `lossless` additionally pins the byte-level
    // equality of decoded vs source buffers.
    "q323_png_decode" ->
      """WITH im AS (SELECT id AS media_id FROM range(1, 13) t(id)),
        |px AS (SELECT media_id,
        |    ((77 * ((media_id*31 + (3*p.p)*7) % 256)
        |    + 150 * ((media_id*31 + (3*p.p+1)*7) % 256)
        |    + 29 * ((media_id*31 + (3*p.p+2)*7) % 256)) // 256) AS y
        |  FROM im, range(0, 192) p(p))
        |SELECT media_id,
        |  sum(CASE WHEN y // 32 = 0 THEN 1 ELSE 0 END)::BIGINT AS h0,
        |  sum(CASE WHEN y // 32 = 1 THEN 1 ELSE 0 END)::BIGINT AS h1,
        |  sum(CASE WHEN y // 32 = 2 THEN 1 ELSE 0 END)::BIGINT AS h2,
        |  sum(CASE WHEN y // 32 = 3 THEN 1 ELSE 0 END)::BIGINT AS h3,
        |  sum(CASE WHEN y // 32 = 4 THEN 1 ELSE 0 END)::BIGINT AS h4,
        |  sum(CASE WHEN y // 32 = 5 THEN 1 ELSE 0 END)::BIGINT AS h5,
        |  sum(CASE WHEN y // 32 = 6 THEN 1 ELSE 0 END)::BIGINT AS h6,
        |  sum(CASE WHEN y // 32 = 7 THEN 1 ELSE 0 END)::BIGINT AS h7,
        |  TRUE AS lossless
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,
    // q29's gaps-and-islands oracle verbatim: the engine side computes
    // the same sessions through a REAL transformWithState streaming
    // query (RocksDB state, event-time timers), so a hash match judges
    // the Spark-4 arbitrary-state surface against SQL semantics.
    "q346_wav_decode" ->
      """WITH m AS (SELECT id AS media_id,
        |    CASE WHEN id % 5 = 0 THEN 0.0 ELSE 2000.0 + id * 100 END AS amp,
        |    ((id % 7) + 1) * 0.01 AS w
        |  FROM range(1, 21) t(id)),
        |s AS (SELECT media_id, (t.t // 240)::BIGINT AS f,
        |    floor(amp * sin(t.t * w)) AS v
        |  FROM m, range(0, 2400) t(t)),
        |fr AS (SELECT media_id, f, sqrt(avg(v * v)) AS rms
        |  FROM s GROUP BY 1, 2)
        |SELECT media_id, 16000::BIGINT AS sample_rate, 1::BIGINT AS channels,
        |  count(*)::BIGINT AS n_frames,
        |  round(avg(rms), 4) AS mean_rms,
        |  round(max(rms), 4) AS peak_rms,
        |  sum(CASE WHEN rms < 1.0 THEN 1 ELSE 0 END)::BIGINT AS silence_frames,
        |  true AS lossless
        |FROM fr GROUP BY 1 ORDER BY media_id""".stripMargin,
    "q356_avi_decode" ->
      """WITH m AS (SELECT id AS media_id, ((id % 3) + 1) * 10 AS fps
        |  FROM range(1, 11) t(id)),
        |v AS (SELECT media_id, i.i AS i,
        |    (media_id*13 + (i.i % 72)*5 + (i.i // 72)
        |     + CASE WHEN i.i // 72 >= 2
        |            THEN ((i.i % 72) % 3 + 1) * 100 ELSE 0 END) % 256 AS v
        |  FROM m, range(0, 288) i(i)),
        |d AS (SELECT a.media_id, (a.i // 72) AS b,
        |    sum(abs(a.v - bb.v))::BIGINT AS motion
        |  FROM v a JOIN v bb
        |    ON a.media_id = bb.media_id AND bb.i = a.i + 72
        |  GROUP BY 1, 2),
        |mo AS (SELECT media_id, count(*)::BIGINT AS n_boundaries,
        |    sum(motion)::BIGINT AS total_motion,
        |    max(motion)::BIGINT AS max_motion,
        |    sum(CASE WHEN motion > 1000 THEN 1 ELSE 0 END)::BIGINT AS n_cuts
        |  FROM d GROUP BY 1),
        |px AS (SELECT media_id, (i // 3) AS p,
        |    sum(CASE WHEN i % 3 = 0 THEN 77*v
        |             WHEN i % 3 = 1 THEN 150*v ELSE 29*v END) AS wsum
        |  FROM v GROUP BY 1, 2),
        |ls AS (SELECT media_id, sum(wsum // 256)::BIGINT AS luma_sum
        |  FROM px GROUP BY 1)
        |SELECT m.media_id, 6::BIGINT AS width, 4::BIGINT AS height,
        |  m.fps::BIGINT AS fps_hdr, 4::BIGINT AS n_frames,
        |  mo.n_boundaries, mo.total_motion, mo.max_motion, mo.n_cuts,
        |  ls.luma_sum, true AS lossless
        |FROM m JOIN mo ON m.media_id = mo.media_id
        |  JOIN ls ON m.media_id = ls.media_id
        |ORDER BY m.media_id""".stripMargin,
  )
}
