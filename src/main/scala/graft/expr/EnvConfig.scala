package graft.expr

/** The service's full configuration surface (reference S13,
  * main.py:542-583): 16 env vars with the reference's exact defaulting
  * and validation behavior:
  *
  *   - CSV-split vars: REQUIRED_COLUMNS, DATETIME_COLUMNS,
  *     STRING_ENUM_COLUMNS (main.py:555-557), empties dropped;
  *   - STRING_ENUM_COLUMNS defaults to "gps_validity,incognito_mode"
  *     (main.py:557 — the original domain is GPS/vehicle telemetry);
  *   - NUM_MESSAGES defaults to 25000 (main.py:569);
  *   - every *connection* var is mandatory — any missing/empty value
  *     fails fast listing the offenders (main.py:580-581).
  */
final case class ServiceConfig(
    kafkaHost: String,
    kafkaTopic: String,
    kafkaConsumerGroup: String,
    autoOffsetReset: String,
    dlqTopic: String,
    chHost: String,
    chPort: Int,
    chUser: String,
    chPassword: String,
    chDatabase: String,
    chTable: String,
    numMessages: Int,
    pipeline: PipelineConfig)

object ServiceConfig {

  val ConnectionVars: Seq[String] = Seq(
    "KAFKA_HOST", "KAFKA_TOPIC", "KAFKA_CONSUMER_GROUP", "AUTO_OFFSET_RESET",
    "DLQ_TOPIC", "CH_HOST", "CH_PORT", "CH_USER", "CH_PASSWORD",
    "CH_DATABASE", "CH_TABLE")

  private def csv(v: Option[String]): Seq[String] =
    v.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  /** Parse + validate an env map. Fails with ALL missing var names at
    * once (mirrors the reference's single aggregated error,
    * main.py:580-581).
    */
  def fromEnv(env: Map[String, String]): ServiceConfig = {
    val missing = ConnectionVars.filter(v => env.get(v).forall(_.trim.isEmpty))
    require(missing.isEmpty, s"Missing required environment variables: ${missing.mkString(", ")}")
    ServiceConfig(
      kafkaHost = env("KAFKA_HOST"),
      kafkaTopic = env("KAFKA_TOPIC"),
      kafkaConsumerGroup = env("KAFKA_CONSUMER_GROUP"),
      autoOffsetReset = env("AUTO_OFFSET_RESET"),
      dlqTopic = env("DLQ_TOPIC"),
      chHost = env("CH_HOST"),
      chPort = env("CH_PORT").toInt,
      chUser = env("CH_USER"),
      chPassword = env("CH_PASSWORD"),
      chDatabase = env("CH_DATABASE"),
      chTable = env("CH_TABLE"),
      numMessages = env.get("NUM_MESSAGES").map(_.toInt).getOrElse(25000),
      pipeline = PipelineConfig(
        required = csv(env.get("REQUIRED_COLUMNS")),
        datetimeCols = csv(env.get("DATETIME_COLUMNS")).toSet,
        stringEnumCols = env.get("STRING_ENUM_COLUMNS")
          .filter(_.trim.nonEmpty) // falsy "" falls back, like `env.get(...) or default`
          .map(s => csv(Some(s)).toSet)
          .getOrElse(Set("gps_validity", "incognito_mode"))))
  }

  /** Kafka source options for `spark.readStream.format("kafka")` —
    * value-equivalent to the reference's consumer config
    * (main.py:492-498, 569): batch cap, 50 MiB fetch, offset reset.
    * The kafka connector jar doesn't ship in this environment (SURVEY
    * §7.1), so this builder is exercised at the option level only;
    * wiring is `.options(kafkaSourceOptions(cfg)).load()`.
    */
  def kafkaSourceOptions(cfg: ServiceConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.kafkaHost,
    "subscribe" -> cfg.kafkaTopic,
    "kafka.group.id" -> cfg.kafkaConsumerGroup,
    "startingOffsets" -> (if (cfg.autoOffsetReset == "earliest") "earliest" else "latest"),
    "maxOffsetsPerTrigger" -> cfg.numMessages.toString, // 25000, main.py:569
    "kafka.fetch.max.bytes" -> (50 * 1024 * 1024).toString) // main.py:496

  /** JDBC sink options for the ClickHouse table: the reference's
    * async-insert settings (main.py:329-335) ride as ClickHouse session
    * settings on the JDBC URL. Wiring is
    * `df.write.format("jdbc").options(clickhouseSinkOptions(cfg))`.
    */
  def clickhouseSinkOptions(cfg: ServiceConfig): Map[String, String] = Map(
    "url" -> (s"jdbc:clickhouse://${cfg.chHost}:${cfg.chPort}/${cfg.chDatabase}" +
      "?async_insert=1&wait_for_async_insert=1&async_insert_threads=4" +
      "&async_insert_busy_timeout_ms=500&async_insert_max_data_size=104857600"),
    "dbtable" -> cfg.chTable,
    "user" -> cfg.chUser,
    "password" -> cfg.chPassword,
    "batchsize" -> cfg.numMessages.toString)
}
