package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.expr.ServiceConfig
import graft.pipeline.Pipeline

/** Streaming payload sources (reference S1, main.py:492-509). Each
  * impl produces a streaming DataFrame with the single payload column
  * `Pipeline.ValueCol` — the exact shape `StreamJob.start` consumes.
  */
trait StreamSource {
  def load(spark: SparkSession): DataFrame
}

/** Line-delimited JSON files appearing in a directory — the
  * environment's stand-in for a Kafka topic (no broker or connector
  * jar ships here, SURVEY §7.1). `maxFilesPerTrigger` plays the role
  * of `NUM_MESSAGES` batch capping.
  */
final class FileJsonSource(dir: String, maxFilesPerTrigger: Int = 10) extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .select(col("value").as(Pipeline.ValueCol))
}

/** The production Kafka source (documented, compile-checked; not
  * runnable here — see SURVEY §7.1). Options are value-equivalent to
  * the reference's consumer config: 25k-message batch cap, 50 MiB
  * fetch, offset-reset policy (main.py:492-509, 569).
  */
final class KafkaSource(cfg: ServiceConfig) extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .options(ServiceConfig.kafkaSourceOptions(cfg))
      .load()
      .selectExpr(s"CAST(value AS STRING) AS ${Pipeline.ValueCol}")
}
