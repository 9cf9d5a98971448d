package graft

import org.apache.spark.sql.functions._

import graft.io.{ClickHouseHttp, MiniClickHouse}

/** The ClickHouse HTTP wire leg (q369's machinery): auth, settings
  * enforcement, Arrow roundtrip fidelity, and fail-loud paths.
  * Reference behavior: main.py:305-356 (insert_arrow over HTTP 8123,
  * async-insert settings 329-335).
  */
class ClickHouseHttpSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00.123456Z")),
      10L, "click", 1.25),
    (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-02-29T23:59:59.999999Z")),
      11L, "click", 2.50),
    (3L, java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:00:00Z")),
      12L, "purchase", 100.01))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  private def target(port: Int, user: String = "u", key: String = "k",
      settings: Seq[(String, String)] = ClickHouseHttp.AsyncInsertSettings) =
    ClickHouseHttp.Target("127.0.0.1", port, user, key, "db", "t", settings)

  test("settings literal parity with the reference (main.py:329-335)") {
    assert(ClickHouseHttp.AsyncInsertSettings.toMap == Map(
      "async_insert" -> "1",
      "wait_for_async_insert" -> "1",
      "async_insert_threads" -> "4",
      "async_insert_busy_timeout_ms" -> "500",
      "async_insert_max_data_size" -> "100000000"))
  }

  test("arrow wire roundtrip: counts, exact cents, id sums, µs timestamps") {
    val srv = new MiniClickHouse("u", "k")
    val port = srv.start()
    try {
      val n = ClickHouseHttp.insertArrow(frame, target(port))
      assert(n == 3)
      assert(srv.rejected == 0)
      assert(srv.insertTargets == Set("INSERT INTO db.t FORMAT ArrowStream"))
      val snap = srv.snapshot.map { case (k, a, b, c, d, e) => k -> ((a, b, c, d, e)) }.toMap
      assert(snap("click") == ((2L, 375L, 3L, 21L,
        java.time.Instant.parse("2024-02-29T23:59:59.999999Z").toEpochMilli * 1000 + 999)))
      assert(snap("purchase") == ((1L, 10001L, 3L, 12L,
        java.time.Instant.parse("2024-06-01T12:00:00Z").toEpochMilli * 1000)))
    } finally srv.stop()
  }

  test("wrong credentials are rejected loudly (401) and nothing lands") {
    val srv = new MiniClickHouse("u", "k")
    val port = srv.start()
    try {
      val e = intercept[Exception] {
        ClickHouseHttp.insertArrow(frame, target(port, key = "wrong"))
      }
      assert(e.getMessage != null)
      assert(srv.snapshot.isEmpty && srv.rejected >= 1)
    } finally srv.stop()
  }

  test("an insert missing an async setting is rejected (the parity gate)") {
    val srv = new MiniClickHouse("u", "k")
    val port = srv.start()
    try {
      val e = intercept[Exception] {
        ClickHouseHttp.insertArrow(frame,
          target(port, settings = ClickHouseHttp.AsyncInsertSettings.tail))
      }
      assert(e.getMessage != null)
      assert(srv.snapshot.isEmpty && srv.rejected >= 1)
    } finally srv.stop()
  }

  test("unsupported column types fail loud driver-side, before any POST") {
    val srv = new MiniClickHouse("u", "k")
    val port = srv.start()
    try {
      val bad = frame.withColumn("arr", array(lit(1), lit(2)))
      val e = intercept[IllegalArgumentException] {
        ClickHouseHttp.insertArrow(bad, target(port))
      }
      assert(e.getMessage.contains("unsupported column type"))
      assert(srv.snapshot.isEmpty)
    } finally srv.stop()
  }
}
