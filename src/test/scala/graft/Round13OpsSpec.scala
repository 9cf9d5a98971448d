package graft

import org.apache.spark.sql.functions._

/** Ground truth for the round-9 additions: the AVI container round
  * trip through the judged query (lossless, header metadata, exactly
  * one scene cut per clip), the banded-LSH recall differential (every
  * exact near-dup pair survives the bucketing at the judged dial),
  * and the codegen LshBucketKeys expression against a hand-computed
  * sign-bit construction.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q356 AVI decode ----------------------------------------------------

  test("avi decode: lossless round trips, header metadata, one cut per clip") {
    val rows = Queries.all("q356_avi_decode")(spark, sf()).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("lossless"), s"media ${r.getLong(0)} not lossless")
      assert(r.getAs[Long]("width") == 6L && r.getAs[Long]("height") == 4L)
      assert(r.getAs[Long]("fps_hdr") == (r.getLong(0) % 3 + 1) * 10,
        s"media ${r.getLong(0)} fps mangled")
      assert(r.getAs[Long]("n_frames") == 4L)
      assert(r.getAs[Long]("n_boundaries") == 3L)
      // the generator plants exactly one scene cut (at frame 2)
      assert(r.getAs[Long]("n_cuts") == 1L,
        s"media ${r.getLong(0)} expected exactly one cut")
    }
  }

  // ---- banded hyperplane LSH ----------------------------------------------

  test("banded LSH finds every exact pair at the judged dial (planted twins)") {
    import graft.operators.Dedup
    // 40 base vectors + twins at cosine ~0.985 — same construction as
    // q26, smaller so the exact all-pairs differential is instant.
    val base = spark.range(1, 41).toDF("id")
      .withColumn("v", transform(sequence(lit(0), lit(63)), j =>
        sin(col("id") * 7 + j.cast("double") * 13)))
    val twins = base.select((col("id") + 1000).as("id"),
      zip_with(col("v"), sequence(lit(0), lit(63)), (x, j) =>
        x + lit(0.015) * ((col("id") * 31 + j.cast("long") * 7) % 5 - 2)
          .cast("double")).as("v"))
    val corpus = base.unionByName(twins)
    val exact = Dedup.embeddingPairsExact(corpus, "id", "v", 0.95)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLshBanded(corpus, "id", "v",
        dim = 64, threshold = 0.95, numPlanes = 8, tables = 24)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "construction must plant near-dup pairs")
    assert(lsh == exact,
      s"banded LSH missed ${(exact -- lsh).size} of ${exact.size} exact pairs")
    spark.catalog.clearCache()
  }

  // ---- transformWithState checkpoint restart --------------------------------

  /** The exactly-once-across-restarts claim for transformWithState
    * STATE itself (Dsv2SinkSpec proves it for the sink): drain half
    * the topic, "crash" (the query object goes away; only the
    * checkpoint survives), append the rest of the topic, restart from
    * the SAME checkpoint, and the judged frame must equal an unbroken
    * run — RocksDB state, armed timers, and the event-time watermark
    * all resume. The continuation slice is deliberately OUT-OF-ORDER
    * (day 3 after day 4, admitted under a 10-day watermark delay), so
    * the restart path also exercises the monotone timer re-arm.
    */
  test("transformWithState: restart from checkpoint equals the unbroken run") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.MapStateRevenue

    def ev(key: Long, day: String, cents: Long) =
      (key, Timestamp.valueOf(s"2024-01-$day 12:00:00"), cents)
    val slice1 = Seq(ev(1, "01", 100), ev(2, "01", 200))
    val slice2 = Seq(ev(1, "04", 400), ev(2, "02", 50))
    val slice3 = Seq(ev(1, "03", 300), ev(3, "02", 700)) // out-of-order + new key
    val slice4 = Seq((-1L, Timestamp.valueOf("2024-02-15 00:00:00"), -1L))
    val schema = Seq(slice1.head).toDF("key", "ts", "cents").schema

    def writeSlice(rows: Seq[(Long, Timestamp, Long)], topic: java.io.File,
        name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("slice_").toFile
      rows.toDF("key", "ts", "cents").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(topic, s"$name.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime)) // FileStreamSource drains oldest-first
    }

    def drain(topic: String, ckpt: String, out: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(topic)
        .as[MapStateRevenue.REvent](org.apache.spark.sql.Encoders
          .product[MapStateRevenue.REvent])
        .withWatermark("ts", "10 days")
      val q = MapStateRevenue.dailyRevenue(stream).toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    def judged(out: String): Set[(Long, Long, Long)] = {
      val snaps = spark.read.parquet(out)
      val latest = snaps.groupBy("key").agg(max("tagMs").as("tagMs"))
      snaps.join(latest, Seq("key", "tagMs"))
        .select("key", "day", "cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val t0 = System.currentTimeMillis() - 3600000L

      // Interrupted run: slices 1-2, drain, APPEND 3-4, drain again
      // from the same checkpoint.
      val topicA = java.nio.file.Files.createTempDirectory("tws_rst_topic_").toFile
      val ckptA = java.nio.file.Files.createTempDirectory("tws_rst_ckpt_").toString
      val outA = java.nio.file.Files.createTempDirectory("tws_rst_out_").toString
      writeSlice(slice1, topicA, "s1", t0)
      writeSlice(slice2, topicA, "s2", t0 + 1000)
      drain(topicA.toString, ckptA, outA)
      writeSlice(slice3, topicA, "s3", t0 + 2000)
      writeSlice(slice4, topicA, "s4", t0 + 3000)
      drain(topicA.toString, ckptA, outA)

      // Unbroken baseline: all four slices, fresh checkpoint, one drain.
      val topicB = java.nio.file.Files.createTempDirectory("tws_unb_topic_").toFile
      val ckptB = java.nio.file.Files.createTempDirectory("tws_unb_ckpt_").toString
      val outB = java.nio.file.Files.createTempDirectory("tws_unb_out_").toString
      Seq(("s1", slice1, 0L), ("s2", slice2, 1000L), ("s3", slice3, 2000L))
        .foreach { case (n, rows, dt) => writeSlice(rows, topicB, n, t0 + dt) }
      writeSlice(slice4, topicB, "s4", t0 + 3000)
      drain(topicB.toString, ckptB, outB)

      val restarted = judged(outA)
      val unbroken = judged(outB)
      def day(d: String): Long = math.floorDiv(
        Timestamp.valueOf(s"2024-01-$d 12:00:00").getTime, 86400000L)
      val expected = Set(
        (1L, day("01"), 100L), (1L, day("03"), 300L), (1L, day("04"), 400L),
        (2L, day("01"), 200L), (2L, day("02"), 50L),
        (3L, day("02"), 700L))
      assert(unbroken == expected, s"baseline drifted: $unbroken")
      assert(restarted == unbroken,
        s"restart diverged: ${restarted.diff(unbroken)} vs ${unbroken.diff(restarted)}")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** STATE MIGRATION — upgrade a stateful streaming job WITHOUT
    * replaying history: v1's RocksDB state is extracted through the
    * state-store reader (the MapState rows via `stateVarName` + the
    * armed timers via `readRegisteredTimers`, which reconstruct each
    * key's lastUs EXACTLY since the processor arms at
    * floorDiv(lastUs+999,1000)+1), converted to UserInit seeds, and a
    * FRESH query (new checkpoint — not a restart) warm-starts from
    * them via StatefulProcessorWithInitialState and consumes only the
    * remaining topic. The judged frame must equal the unbroken run —
    * including a history-only key that never appears in the v2 topic
    * (it must emit purely from seeded state + its re-armed timer).
    */
  test("state migration: reader-extracted v1 state warm-starts a fresh v2 query") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.MapStateRevenue

    def ev(key: Long, day: String, cents: Long) =
      (key, Timestamp.valueOf(s"2024-01-$day 12:00:00"), cents)
    val half1 = Seq(ev(1, "01", 100), ev(2, "01", 200), ev(1, "04", 400),
      ev(2, "02", 50)) // key 2 is HISTORY-ONLY after migration
    val half2 = Seq(ev(1, "03", 300), ev(3, "02", 700))
    val sentinel = Seq((-1L, Timestamp.valueOf("2024-02-15 00:00:00"), -1L))
    val schema = Seq(half1.head).toDF("key", "ts", "cents").schema

    def stage(rows: Seq[(Long, Timestamp, Long)]): String = {
      val d = java.nio.file.Files.createTempDirectory("mig_topic_").toString
      rows.toDF("key", "ts", "cents").write.mode("overwrite").parquet(d)
      d
    }
    def stream(topic: String) = spark.readStream.schema(schema).parquet(topic)
      .as[MapStateRevenue.REvent](org.apache.spark.sql.Encoders
        .product[MapStateRevenue.REvent])
      .withWatermark("ts", "10 days")
    def drain(df: org.apache.spark.sql.DataFrame, ckpt: String,
        out: Option[String]): Unit = {
      val w = out match {
        case Some(o) => df.writeStream.format("parquet").option("path", o)
        case None => df.writeStream.format("noop")
      }
      val q = w.option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def judged(out: String): Set[(Long, Long, Long)] = {
      val snaps = spark.read.parquet(out)
      val latest = snaps.groupBy("key").agg(max("tagMs").as("tagMs"))
      snaps.join(latest, Seq("key", "tagMs")).select("key", "day", "cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      // v1: first half only, no sentinel — nothing fires, state retained.
      val ckptV1 = java.nio.file.Files.createTempDirectory("mig_v1_ckpt_").toString
      drain(MapStateRevenue.dailyRevenue(stream(stage(half1))).toDF(),
        ckptV1, None)

      // Extract v1 state: the map entries + each key's armed timer.
      val st = spark.read.format("statestore").option("path", ckptV1)
        .option("stateVarName", "days").load()
        .select(col("key.value").as("key"),
          col("user_map_key.value").as("day"),
          col("user_map_value.value").as("cents"))
      val tm = spark.read.format("statestore").option("path", ckptV1)
        .option("readRegisteredTimers", "true").load()
        .select(col("key.value").as("key"),
          ((col("expiration_timestamp_ms") - 1) * 1000).as("lastUs"))
      val seeds = st
        .groupBy("key")
        .agg(map_from_entries(collect_list(struct(col("day"), col("cents"))))
          .as("days"))
        .join(tm, "key")
        .select("key", "lastUs", "days")
        .as[MapStateRevenue.UserInit](org.apache.spark.sql.Encoders
          .product[MapStateRevenue.UserInit])

      // v2: FRESH checkpoint, remaining topic only, warm-started.
      val ckptV2 = java.nio.file.Files.createTempDirectory("mig_v2_ckpt_").toString
      val outV2 = java.nio.file.Files.createTempDirectory("mig_v2_out_").toString
      drain(MapStateRevenue.dailyRevenueWithInit(
          stream(stage(half2 ++ sentinel)), seeds).toDF(),
        ckptV2, Some(outV2))

      // Unbroken baseline over the full topic.
      val ckptB = java.nio.file.Files.createTempDirectory("mig_b_ckpt_").toString
      val outB = java.nio.file.Files.createTempDirectory("mig_b_out_").toString
      drain(MapStateRevenue.dailyRevenue(
          stream(stage(half1 ++ half2 ++ sentinel))).toDF(),
        ckptB, Some(outB))

      val migrated = judged(outV2)
      val unbroken = judged(outB)
      assert(migrated.nonEmpty && migrated == unbroken,
        s"migration diverged: ${migrated.diff(unbroken)} vs ${unbroken.diff(migrated)}")
      assert(migrated.exists(_._1 == 2L),
        "history-only key must emit from seeded state alone")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // ---- ListState cap contract -----------------------------------------------

  /** The q352 operator's own 100 TB guard: an engineered hot key
    * (3000 events against a 256-value cap) must trigger level-sampling
    * compaction — retained state bounded by the cap, exact count
    * preserved, sample median in the right neighborhood — while an
    * under-cap key stays fully exact. The judged q352 runs the
    * unbounded dial; this pins the bounded one.
    */
  test("ListState cap engages on a hot key: bounded state, exact count") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.ListStateMedian

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // hot key 1: cents 7, 14, ..., spread over [7, 21000]
    val hot = (1 to 3000).map(i => (1L, new Timestamp(t0 + i * 1000L), i * 7L))
    // cold key 2: 9 values, exact lower median = 50
    val cold = (1 to 9).map(i => (2L, new Timestamp(t0 + i * 1000L), i * 10L))
    val sentinel = Seq((-1L, Timestamp.valueOf("2024-03-01 00:00:00"), -1L))
    val topic = java.nio.file.Files.createTempDirectory("lsm_cap_topic_").toString
    (hot ++ cold ++ sentinel).toDF("key", "ts", "cents")
      .write.mode("overwrite").parquet(topic)

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = spark.readStream
        .schema(hot.toDF("key", "ts", "cents").schema).parquet(topic)
        .as[ListStateMedian.MEvent](org.apache.spark.sql.Encoders
          .product[ListStateMedian.MEvent])
        .withWatermark("ts", "0 seconds")
      val out = java.nio.file.Files.createTempDirectory("lsm_cap_out_").toString
      val q = ListStateMedian.medians(stream, maxKept = 256).toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("lsm_cap_ckpt_").toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val rows = spark.read.parquet(out)
        .groupBy("key")
        .agg(max_by(struct(col("n"), col("medianCents"), col("nKept")),
          col("tagMs")).as("m"))
        .select(col("key"), col("m.n"), col("m.medianCents"), col("m.nKept"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

      val (hotN, hotMed, hotKept) = rows(1L)
      assert(hotN == 3000L, "exact count must survive the cap")
      assert(hotKept <= 256L && hotKept >= 32L,
        s"cap must engage and retain a usable sample, kept $hotKept")
      // true lower median = 1500*7 = 10500; level-sample of >=180 of a
      // uniform spread estimates it within a few percent — 30% is >4 sigma
      assert(math.abs(hotMed - 10500L) <= 3150L,
        s"sample median $hotMed too far from 10500")

      val (coldN, coldMed, coldKept) = rows(2L)
      assert(coldN == 9L && coldKept == 9L && coldMed == 50L,
        s"under-cap key must stay exact, got ($coldN, $coldMed, $coldKept)")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** Concurrent query runners sharing one session, each wrapped in
    * CacheRegistry.withScope — the multi-tenant shape the registry's
    * scoping exists for. Every chosen query persists intermediates
    * through the registry (Triangles' graph frames, Adamic-Adar's
    * edge set, the LSH stage build), so an unscoped releaseAll from
    * any thread would have dropped blocks a sibling still reads.
    * Results must equal the serial runs exactly.
    */
  test("concurrent query runners under withScope match serial results") {
    val names = Seq("q01_agg_pricing", "q23_dedup_minhash",
      "q198_adamic_adar", "q212_local_clustering")
    CacheRegistry.releaseAll()
    val dir = sf()
    val serial = names.map(n =>
      Queries.all(n)(spark, dir).collect().map(_.toString).toSeq)
    CacheRegistry.releaseAll()
    val results = new Array[Seq[String]](names.length)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = names.zipWithIndex.map { case (n, i) =>
      val th = new Thread(() =>
        try results(i) = CacheRegistry.withScope {
          Queries.all(n)(spark, dir).collect().map(_.toString).toSeq
        } catch { case e: Throwable => errs.add(e) }, s"graft-conc-$i")
      th.start(); th
    }
    threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent run failed: ${Option(errs.peek()).map(_.getMessage)}")
    names.indices.foreach { i =>
      assert(results(i) == serial(i), s"${names(i)} diverged under concurrency")
    }
    assert(CacheRegistry.outstanding == 0,
      "every scope must have released its own registrations")
  }

  /** The parity contract generalized to QueryBench's FULL serving mix
    * (scan-agg, join, window, text, LSH consumer, both graph
    * fixpoints, and the RocksDB streaming drain): three runners each
    * execute the whole mix concurrently, rotated so no two are in
    * lockstep, and every result must equal the serial canon — this is
    * the spec-side twin of the inline fingerprint check QueryBench
    * performs on every measured run.
    */
  test("QueryBench serving mix: concurrent full-mix runners match serial") {
    val names = QueryBench.Mix
    CacheRegistry.releaseAll()
    val dir = sf()
    val serial: Map[String, Seq[String]] = names.map(n =>
      n -> Queries.all(n)(spark, dir).collect().map(_.toString).toSeq).toMap
    CacheRegistry.releaseAll()
    val nRunners = 3
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until nRunners).map { i =>
      val th = new Thread(() =>
        try names.indices.foreach { j =>
          val n = names((i + j) % names.size)
          val got = CacheRegistry.withScope {
            Queries.all(n)(spark, dir).collect().map(_.toString).toSeq
          }
          assert(got == serial(n), s"runner $i: $n diverged under concurrency")
        } catch { case e: Throwable => errs.add(e) }, s"graft-mix-$i")
      th.start(); th
    }
    threads.foreach(_.join())
    assert(errs.isEmpty,
      s"concurrent mix failed: ${Option(errs.peek()).map(_.toString)}")
    assert(CacheRegistry.outstanding == 0,
      "every scope must have released its own registrations")
  }

  /** Multimodal's scale claim, plan-asserted: a metadata-only query
    * over a media table must NOT read the binary payload column —
    * columnar pruning keeps the scan's ReadSchema to the metadata
    * fields, so payload bytes never leave the parquet column chunks.
    */
  test("media metadata queries prune the binary payload from the scan") {
    import graft.operators.Multimodal
    val rows = (1L to 20L).map(i => Multimodal.MediaRecord(
      i, "image", "image/png", 16, 12, 0L, Array.fill(256)((i % 251).toByte)))
    val dir = java.nio.file.Files.createTempDirectory("media_prune_").toString
    rows.toDS().write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("kind") === "image")
      .groupBy("mime").agg(count(lit(1)).as("n"), avg("width").as("w"))
    val p = q.queryExecution.executedPlan.toString
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && !read.contains("payload"),
      s"payload must be pruned from the scan, got ReadSchema: $read")
    assert(q.collect().map(_.getLong(1)).sum == 20L)
  }

  // ---- Triangles assumeCanonical ---------------------------------------------

  /** The trusted-input fast path must be result-identical to the
    * guarded path on genuinely canonical input (and the guard itself
    * still canonicalizes messy input — the default stays safe).
    */
  test("Triangles assumeCanonical: identical census on canonical input") {
    import graft.operators.Triangles
    val canon = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val guarded = Triangles.census(canon, "u", "v").collect()(0)
    val trusted = Triangles.census(canon, "u", "v", assumeCanonical = true)
      .collect()(0)
    assert(guarded == trusted)
    assert(trusted.getAs[Long]("n_triangles") == 2L) // {1,2,3}, {2,3,4}
    // messy twin (dupes + reversed + self-loop) through the GUARDED path
    val messy = canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
      .unionAll(Seq((1L, 1L)).toDF("u", "v"))
    val guardedMessy = Triangles.census(messy, "u", "v").collect()(0)
    assert(guardedMessy == guarded)
    spark.catalog.clearCache()
  }

  // ---- CacheRegistry scoping --------------------------------------------------

  /** The concurrent-runner isolation contract: a scope's exit releases
    * only ITS registrations — a sibling thread's (or the unscoped
    * global pool's) cached frames survive until releaseAll.
    */
  test("CacheRegistry.withScope releases only its own registrations") {
    import graft.CacheRegistry
    CacheRegistry.releaseAll()
    val outside = CacheRegistry.persist(spark.range(10).toDF("a"))
    outside.count()
    var insideFrame: org.apache.spark.sql.DataFrame = null
    CacheRegistry.withScope {
      insideFrame = CacheRegistry.persist(spark.range(20).toDF("b"))
      insideFrame.count()
      assert(insideFrame.storageLevel.useMemory, "scoped frame must be cached")
    }
    assert(!insideFrame.storageLevel.useMemory,
      "scope exit must release the scoped frame")
    assert(outside.storageLevel.useMemory,
      "scope exit must NOT release other owners' frames")
    assert(CacheRegistry.outstanding == 1)
    CacheRegistry.releaseAll()
    assert(!outside.storageLevel.useMemory && CacheRegistry.outstanding == 0)
  }

  /** Spark's CacheManager dedupes cached plans by canonical equality
    * SparkContext-wide, so two scopes persisting plan-identical frames
    * share ONE cache entry — release must be LAST-SCOPE-OUT or the
    * first exit unpersists blocks the surviving scope still reads
    * (the BlockNotFoundException QueryBench hit at N ≥ 16, where the
    * rotated mix guarantees same-query overlap). Nested scopes give a
    * deterministic single-threaded reproduction of the overlap.
    */
  test("CacheRegistry refcounts plan-identical frames across scopes " +
      "(last scope out unpersists)") {
    import graft.CacheRegistry
    CacheRegistry.releaseAll()
    def frame = spark.range(30).toDF("c").filter(col("c") % 3 === 0)
    var outerF: org.apache.spark.sql.DataFrame = null
    CacheRegistry.withScope {
      outerF = CacheRegistry.persist(frame)
      outerF.count()
      CacheRegistry.withScope {
        val innerF = CacheRegistry.persist(frame) // same canonical plan
        innerF.count()
      }
      // Inner scope exited, but the OUTER registration shares the
      // cache entry — it must still be cached and readable.
      assert(outerF.storageLevel.useMemory,
        "inner scope exit must not unpersist a plan the outer scope still tracks")
      assert(outerF.count() == 10)
    }
    assert(!outerF.storageLevel.useMemory,
      "last scope out must actually unpersist")
    assert(CacheRegistry.outstanding == 0)
  }

  test("LshBucketKeys matches the hand-computed sign-bit construction") {
    import graft.expr.VectorExpressions
    val dim = 4
    val mat = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0), // table 0
      Array(0.0, 0.0, 1.0, 0.0), Array(-1.0, 0.0, 0.0, 0.0)) // table 1
    val df = Seq(
      (1L, Seq(0.5, -0.5, 0.25, 0.0)),
      (2L, Seq(-2.0, 3.0, -1.0, 4.0))).toDF("id", "v")
      .select(col("id"),
        VectorExpressions.lshBucketKeys(col("v"), mat, numPlanes = 2,
          tables = 2).as("keys"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // vec 1: t0 planes (x>=0 -> 1, y>=0 -> 0) = 0b01; t1 (z>=0 -> 1,
    // -x>=0 -> 0) = (1<<2)|0b01
    assert(got(1L) == Seq(1L, (1L << 2) | 1L))
    // vec 2: t0 (x<0, y>=0) = 0b10; t1 (z<0, -x>=0) = (1<<2)|0b10
    assert(got(2L) == Seq(2L, (1L << 2) | 2L))
  }
}
