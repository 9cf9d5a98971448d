package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.ServiceConfig

/** S13 config-loader semantics (reference main.py:542-583). */
class ConfigSpec extends AnyFunSuite {

  private val full = Map(
    "KAFKA_HOST" -> "k:9092", "KAFKA_TOPIC" -> "t", "KAFKA_CONSUMER_GROUP" -> "g",
    "AUTO_OFFSET_RESET" -> "earliest", "DLQ_TOPIC" -> "dlq",
    "CH_HOST" -> "ch", "CH_PORT" -> "8123", "CH_USER" -> "u",
    "CH_PASSWORD" -> "p", "CH_DATABASE" -> "db", "CH_TABLE" -> "tbl")

  test("defaults: NUM_MESSAGES 25000, string-enum cols gps_validity/incognito_mode (main.py:557, 569)") {
    val c = ServiceConfig.fromEnv(full)
    assert(c.numMessages == 25000)
    assert(c.pipeline.stringEnumCols == Set("gps_validity", "incognito_mode"))
    assert(c.pipeline.required.isEmpty && c.pipeline.datetimeCols.isEmpty)
  }

  test("CSV splitting trims and drops empties (main.py:555-557)") {
    val c = ServiceConfig.fromEnv(full ++ Map(
      "REQUIRED_COLUMNS" -> " a , b ,,c",
      "DATETIME_COLUMNS" -> "ts",
      "STRING_ENUM_COLUMNS" -> ""))
    assert(c.pipeline.required == Seq("a", "b", "c"))
    assert(c.pipeline.datetimeCols == Set("ts"))
    assert(c.pipeline.stringEnumCols == Set("gps_validity", "incognito_mode"),
      "empty STRING_ENUM_COLUMNS value falls back to the default, matching the reference's falsy check")
  }

  test("missing connection vars fail fast, all listed at once (main.py:580-581)") {
    val e = intercept[IllegalArgumentException] {
      ServiceConfig.fromEnv(full - "CH_HOST" - "DLQ_TOPIC" + ("KAFKA_TOPIC" -> "  "))
    }
    assert(e.getMessage.contains("KAFKA_TOPIC"))
    assert(e.getMessage.contains("DLQ_TOPIC"))
    assert(e.getMessage.contains("CH_HOST"))
  }

  test("kafka source options carry the reference's consumer tuning (main.py:492-498, 569)") {
    val o = ServiceConfig.kafkaSourceOptions(ServiceConfig.fromEnv(full))
    assert(o("maxOffsetsPerTrigger") == "25000")
    assert(o("kafka.fetch.max.bytes") == (50 * 1024 * 1024).toString)
    assert(o("startingOffsets") == "earliest")
    assert(o("subscribe") == "t")
  }

  test("kafka option-map PARITY: the full map equals the reference's literal consumer config") {
    // Not just spot values: the ENTIRE option map, so a dropped or
    // renamed option (or a stray extra one) fails. Literals from
    // main.py — fetch.max.bytes 52428800 (:496), 25000 msgs/trigger
    // (:509, 569), group/offset-reset from env (:492-503).
    val o = ServiceConfig.kafkaSourceOptions(ServiceConfig.fromEnv(full))
    assert(o == Map(
      "kafka.bootstrap.servers" -> "k:9092",
      "subscribe" -> "t",
      "kafka.group.id" -> "g",
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "25000",
      "kafka.fetch.max.bytes" -> "52428800"))
    // the only non-earliest reset value maps to latest
    val latest = ServiceConfig.kafkaSourceOptions(
      ServiceConfig.fromEnv(full + ("AUTO_OFFSET_RESET" -> "latest")))
    assert(latest("startingOffsets") == "latest")
  }

  test("CHType unwraps Nullable/LowCardinality; unknown types fail at analysis time") {
    import graft.types.CHType
    import org.apache.spark.sql.types._
    assert(CHType.toSpark("Nullable(Int64)") == (LongType, Long.MinValue))
    assert(CHType.toSpark("LowCardinality(String)") == (StringType, ""))
    assert(CHType.toSpark("Nullable(LowCardinality(UInt16))") == (IntegerType, 65535))
    assert(CHType.toSpark("Nullable(DateTime)")._1 == TimestampType)
    intercept[IllegalArgumentException](CHType.toSpark("Array(Int64)"))
    intercept[IllegalArgumentException](CHType.toSpark("Decimal(18, 4)"))
  }

  test("clickhouse sink options carry the async-insert settings (main.py:329-335)") {
    val o = ServiceConfig.clickhouseSinkOptions(ServiceConfig.fromEnv(full))
    assert(o("url").contains("async_insert=1"))
    assert(o("url").contains("wait_for_async_insert=1"))
    assert(o("url").contains("async_insert_max_data_size=104857600"))
    assert(o("dbtable") == "tbl")
  }
}
