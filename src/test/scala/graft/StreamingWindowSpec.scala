package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** E22–E24 under the ACTUAL streaming engine (SURVEY §2.4): the same
  * window/session/dedup expressions that run in batch for the DuckDB
  * oracle (Queries.q28–q30, q32) here run under readStream with
  * watermarks — asserting batch/stream parity on the closed windows and
  * exercising late-row dropping, which batch mode cannot.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
    Ev(2, ts("2024-01-01 10:04:00"), 1, 2.0),
    Ev(3, ts("2024-01-01 10:11:00"), 2, 3.0),
    Ev(4, ts("2024-01-01 10:14:00"), 2, 4.0),
    Ev(5, ts("2024-01-01 11:30:00"), 1, 5.0), // advances watermark past 10:xx
    Ev(6, ts("2024-01-01 10:01:00"), 9, 99.0)) // LATE: behind watermark → dropped

  test("E22 streaming: tumbling window agg with watermark drops late rows; closed windows match batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events.take(5): _*)
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("w.start").as("wstart"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("tumble")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    mem.addData(events(5)) // late row, watermark already at ~11:20
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumble").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    // Closed (emitted) windows: 10:00 and 10:10. The 11:30 window is
    // still open; the late 10:01 row must NOT reopen 10:00.
    assert(rows == Set(
      ("2024-01-01 10:00:00.0", 2L, 3.0),
      ("2024-01-01 10:10:00.0", 2L, 7.0)))
  }

  test("E23 streaming: dropDuplicates with watermark dedups within retention") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
      Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0), // exact dup
      Ev(2, ts("2024-01-01 10:05:00"), 1, 2.0))
    val dedup = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    mem.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0)) // dup in later batch
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("E23 streaming: dropDuplicatesWithinWatermark evicts dedup state past the delay (unbounded-retention dual)") {
    // dropDuplicates keeps every key's state forever (exact dedup);
    // dropDuplicatesWithinWatermark keeps state only while the key
    // could still collide under the watermark delay — the bounded-
    // state contract a 100 TB ingest needs. A duplicate ARRIVING
    // within the delay is dropped; the same event id re-sent after
    // the watermark has passed its expiry is treated as NEW (state
    // evicted) — both directions asserted.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
      Ev(1, ts("2024-01-01 10:02:00"), 1, 1.0), // dup within delay → dropped
      Ev(2, ts("2024-01-01 10:05:00"), 1, 2.0))
    val dedup = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    // Advance the watermark far past id 1's expiry, then re-send it.
    mem.addData(Ev(3, ts("2024-01-01 12:00:00"), 1, 3.0))
    q.processAllAvailable()
    mem.addData(Ev(1, ts("2024-01-01 11:55:00"), 1, 9.0)) // state evicted → emits again
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_wm").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 1L, 2L, 3L),
      s"expected the re-sent id after expiry to emit again, got ${ids.toSeq}")
  }

  test("stream-stream interval join: purchases match clicks within the time bound; state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    purchases.addData(
      Ev(1, ts("2024-01-01 10:30:00"), 1, 0.0),
      Ev(2, ts("2024-01-01 12:00:00"), 2, 0.0))
    clicks.addData(
      Ev(10, ts("2024-01-01 10:05:00"), 1, 1.0), // within 30m of purchase 1
      Ev(11, ts("2024-01-01 09:50:00"), 1, 2.0), // too early → no match
      Ev(12, ts("2024-01-01 11:55:00"), 2, 3.0), // within 30m of purchase 2
      Ev(13, ts("2024-01-01 11:55:00"), 9, 4.0)) // other user → no match
    val p = purchases.toDF().withWatermark("ts", "1 hour").alias("p")
    val c = clicks.toDF().withWatermark("ts", "1 hour").alias("c")
    val joined = p.join(c,
      expr("""p.user_id = c.user_id AND
              c.ts BETWEEN p.ts - INTERVAL 30 MINUTES AND p.ts"""))
      .select(col("p.event_id").as("purchase_id"), col("c.event_id").as("click_id"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (2L, 12L)))
  }

  test("stream-stream LEFT OUTER join emits unmatched rows once the watermark expires their state") {
    // The outer side can only emit a null-extended row when the
    // watermark proves no future match can arrive — exercising state
    // EVICTION, which the inner-join test never forces.
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    purchases.addData(
      Ev(1, ts("2024-01-01 10:30:00"), 1, 0.0), // will match click 10
      Ev(2, ts("2024-01-01 10:40:00"), 2, 0.0)) // never matches
    clicks.addData(
      Ev(10, ts("2024-01-01 10:05:00"), 1, 1.0))
    val p = purchases.toDF().withWatermark("ts", "10 minutes").alias("p")
    val c = clicks.toDF().withWatermark("ts", "10 minutes").alias("c")
    val joined = p.join(c,
      expr("""p.user_id = c.user_id AND
              c.ts BETWEEN p.ts - INTERVAL 30 MINUTES AND p.ts"""),
      "left_outer")
      .select(col("p.event_id").as("purchase_id"), col("c.event_id").as("click_id"))
    val q = joined.writeStream.format("memory").queryName("ssleft")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    // Batch 1: only the matched pair can emit; purchase 2's null row is
    // withheld while a future click could still match it.
    val afterFirst = spark.table("ssleft").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(afterFirst == Set((1L, 10L)),
      s"unmatched row must be withheld until watermark passes, got $afterFirst")
    // Advance event time far past purchase 2 + join window + delay →
    // watermark expires its state and the null-extended row emits.
    purchases.addData(Ev(3, ts("2024-01-01 13:00:00"), 7, 0.0))
    clicks.addData(Ev(11, ts("2024-01-01 13:00:00"), 8, 0.0))
    q.processAllAvailable()
    purchases.addData(Ev(4, ts("2024-01-01 14:00:00"), 7, 0.0))
    clicks.addData(Ev(12, ts("2024-01-01 14:00:00"), 8, 0.0))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ssleft").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, -1L)),
      s"expected matched pair AND watermark-expired null row, got $pairs")
  }

  test("stateful sessions streaming: gap closes sessions, watermark timeout flushes the open one") {
    import graft.streaming.StatefulSessions
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 10L * 60 * 1000000 // 10 minutes
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
      Ev(2, ts("2024-01-01 10:05:00"), 1, 2.0),
      Ev(3, ts("2024-01-01 10:30:00"), 1, 4.0)) // >= gap after 10:05 → closes session 1
    val ev = StatefulSessions.project(
      mem.toDF().select(col("user_id"), col("event_id"), col("ts"), col("value")),
      "user_id", "event_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val q = StatefulSessions.sessionizeStream(ev, gapUs)
      .writeStream.format("memory").queryName("statesess")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    val afterBatch1 = spark.table("statesess").collect()
      .map(s => (s.getLong(0), s.getLong(1), s.getLong(2), s.getDouble(3))).toSet
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
    // Only the gap-closed session is out; 10:30 is still open in state.
    assert(afterBatch1 == Set((1L, us("2024-01-01 10:00:00"), 2L, 3.0)))

    // Advance the watermark past lastTs+gap (10:40) in two steps: the
    // 12:00 event sets max event time; the NEXT batch's watermark uses
    // it, firing key 1's event-time timeout.
    mem.addData(Ev(9, ts("2024-01-01 12:00:00"), 2, 9.0))
    q.processAllAvailable()
    mem.addData(Ev(10, ts("2024-01-01 12:00:01"), 2, 1.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("statesess").collect()
      .map(s => (s.getLong(0), s.getLong(1), s.getLong(2), s.getDouble(3))).toSet
    assert(all.contains((1L, us("2024-01-01 10:30:00"), 1L, 4.0)),
      s"open session not flushed by timeout: $all")
  }

  test("transformWithState sessions: modern arbitrary-state API matches flatMapGroupsWithState exactly") {
    // Same scenario as the flatMapGroupsWithState test above, run
    // through StatefulSessions.SessionProcessor (typed ValueState +
    // explicit event-time timers). transformWithState requires the
    // RocksDB state store provider.
    import graft.streaming.StatefulSessions
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapUs = 10L * 60 * 1000000
      val mem = MemoryStream[Ev]
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, 2.0),
        Ev(3, ts("2024-01-01 10:30:00"), 1, 4.0)) // >= gap after 10:05 → closes session 1
      val ev = StatefulSessions.project(
        mem.toDF().select(col("user_id"), col("event_id"), col("ts"), col("value")),
        "user_id", "event_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
      val q = StatefulSessions.sessionizeStreamTws(ev, gapUs)
        .writeStream.format("memory").queryName("twssess")
        .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
      q.processAllAvailable()
      def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
      val afterBatch1 = spark.table("twssess").collect()
        .map(s => (s.getLong(0), s.getLong(1), s.getLong(2), s.getDouble(3))).toSet
      // Only the gap-closed session is out; 10:30 is still open in state.
      assert(afterBatch1 == Set((1L, us("2024-01-01 10:00:00"), 2L, 3.0)),
        afterBatch1.toString)
      // Advance the watermark past lastTs+gap: the registered
      // event-time TIMER fires and flushes the open session.
      mem.addData(Ev(9, ts("2024-01-01 12:00:00"), 2, 9.0))
      q.processAllAvailable()
      mem.addData(Ev(10, ts("2024-01-01 12:00:01"), 2, 1.0))
      q.processAllAvailable()
      q.stop()
      val all = spark.table("twssess").collect()
        .map(s => (s.getLong(0), s.getLong(1), s.getLong(2), s.getDouble(3))).toSet
      assert(all.contains((1L, us("2024-01-01 10:30:00"), 1L, 4.0)),
        s"open session not flushed by the event-time timer: $all")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("E24 streaming: session_window merges within gap, splits across it; parity with batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val data = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, 2.0), // same session (gap 15m)
      Ev(3, ts("2024-01-01 10:40:00"), 1, 3.0), // new session
      Ev(4, ts("2024-01-01 10:05:00"), 2, 4.0),
      Ev(5, ts("2024-01-01 14:00:00"), 1, 9.0)) // closes all earlier sessions
    mem.addData(data: _*)
    val sess = mem.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "15 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("user_id"), col("w.start").as("s_start"), col("n"), col("total"))
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(
      (1L, "2024-01-01 10:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 10:40:00.0", 1L, 3.0),
      (2L, "2024-01-01 10:05:00.0", 1L, 4.0)))
    // Batch parity: identical grouping expression over the same rows
    val batch = data.take(4).toDF()
      .groupBy(session_window(col("ts"), "15 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("user_id"), col("w.start").as("s_start"), col("n"), col("total"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3))).toSet
    assert(batch == rows)
  }

  test("stream-static anti-join dedups an incremental ingest against the corpus") {
    // The streaming analogue of operators/BloomDedup: rows arriving on
    // the stream are dropped when their key already exists in the
    // static corpus table — the static side is re-broadcast per
    // micro-batch, the stream side never shuffles. user_id stands in
    // for the content hash.
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "seen"), (2L, "seen")).toDF("user_id", "tag")
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(10, ts("2024-01-01 10:00:00"), 1, 1.0), // in corpus → dropped
      Ev(11, ts("2024-01-01 10:01:00"), 3, 2.0), // new
      Ev(12, ts("2024-01-01 10:02:00"), 4, 3.0)) // new
    val fresh = mem.toDF().join(corpus, Seq("user_id"), "left_anti")
    val q = fresh.writeStream.format("memory").queryName("fresh_rows")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
    q.processAllAvailable()
    mem.addData(
      Ev(13, ts("2024-01-01 10:03:00"), 2, 4.0), // in corpus → dropped
      Ev(14, ts("2024-01-01 10:04:00"), 5, 5.0)) // new
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fresh_rows").select("event_id")
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(11L, 12L, 14L))
  }

  test("RocksDB state store: the production state backend runs the windowed agg with identical results") {
    // At 100 TB of stream state the default in-memory HDFS-backed
    // store OOMs; RocksDB spills state to local disk and is the
    // production choice. Same query + data as the E22 test — the
    // assertion is both the identical result AND that the RocksDB
    // provider was genuinely engaged (via the provider's own metric).
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      mem.addData(events.take(5): _*)
      val agg = mem.toDF()
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .select(col("w.start").as("wstart"), col("n"), col("total"))
      val q = agg.writeStream.format("memory").queryName("rocks_tumble")
        .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(100)).start()
      q.processAllAvailable()
      val usedRocks = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .exists(so => so.customMetrics.keySet.toArray.exists(_.toString.contains("rocksdb")))
      q.stop()
      val rows = spark.table("rocks_tumble").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("2024-01-01 10:00:00.0", 2L, 3.0),
        ("2024-01-01 10:10:00.0", 2L, 7.0)))
      assert(usedRocks, "RocksDB provider metrics absent — default store silently used")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q324: transformWithState streaming sessionization equals the batch q39 form at sf0.001") {
    // The judged query runs a REAL streaming query (file source,
    // RocksDB state, memory sink); its session set must equal the
    // batch flatMapGroupsWithState form row-for-row.
    val tws = Queries.all("q324_sessions_tws_stream")(spark, sf()).collect().toSeq
    val batch = Queries.all("q39_sessions_stateful")(spark, sf()).collect().toSeq
    assert(tws == batch,
      s"streaming tws (${tws.size} rows) != batch (${batch.size} rows)")
  }

  test("q327: stream-static broadcast enrichment converges to the batch join at sf0.001") {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, round, sum}
    val streamed = Queries.all("q327_stream_static_enrich")(spark, sf()).collect().toSeq
    val dir = sf()
    val batch = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(spark.read.parquet(s"$dir/nation.parquet")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("n_name").collect().toSeq
    assert(streamed == batch, s"streamed=${streamed.take(3)} batch=${batch.take(3)}")
  }
}
