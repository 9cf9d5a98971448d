package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expr.PipelineConfig
import graft.io.{IdempotentParquetSink, ParquetDlqSink}
import graft.pipeline.{BatchOrchestrator, Pipeline}
import graft.schema.SchemaProvider

/** Ingest-throughput bench — the reference's OWN metric class: its one
  * published quantitative claim is ~25,000 msgs per poll batch "for
  * optimal throughput" (reference README.md:137, main.py:569). This
  * drives the full consume→validate→coerce→insert pipeline
  * (S2→S6→S8 with the S10 orchestrator) over re-serialized events in
  * micro-batches of exactly that size and reports rows/s.
  *
  * Shape: the "topic" is staged OUTSIDE the timed region as JSON
  * payload strings partitioned by micro-batch id (each poll reads only
  * its partition's files — the Kafka-fetch analogue; staging cost is
  * the producer's, not the consumer's). The timed region is the
  * sequential batch loop: poll (pruned scan) → Pipeline.process →
  * idempotent-epoch parquet insert + DLQ — the exact body
  * `StreamJob.foreachBatch` runs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.IngestBench"
  * Prints one JSON line; results trend in dev/PERF_LEDGER.md.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batchSize = 25000L // main.py:569 — the reference's optimum
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Stage the topic (untimed): one JSON message per event row,
    // partitioned by micro-batch id so each poll is a pruned scan.
    val events = sources.Tables.events(spark, sfDir)
    val topicDir = Files.createTempDirectory("graft_topic_").toString
    events
      .select(expr(s"event_id div $batchSize").as("batch"),
        to_json(struct(events.columns.map(col): _*)).as(Pipeline.ValueCol))
      .write.mode("overwrite").partitionBy("batch").parquet(topicDir)
    // `batch` comes back Int-inferred from the partition directory names.
    val nBatches = spark.read.parquet(topicDir)
      .select(max(col("batch").cast("long"))).collect()(0).getLong(0) + 1

    val provider = SchemaProvider.fixed(
      events.schema.fields.toSeq.map(f =>
        graft.types.CHType.columnMeta(f.name, graft.types.CHType.fromSpark(f.dataType))))
    val cfg = PipelineConfig(
      required = Seq("event_id", "ts"),
      datetimeCols = Set("ts"),
      stringEnumCols = Set.empty)

    def poll(b: Long) = spark.read.parquet(topicDir)
      .filter(col("batch") === b).select(Pipeline.ValueCol)

    def freshOrchestrator(): (BatchOrchestrator, String) = {
      val sinkDir = Files.createTempDirectory("graft_ingest_sink_").toString
      val dlqDir = Files.createTempDirectory("graft_ingest_dlq_").toString
      (new BatchOrchestrator(provider, cfg,
        new IdempotentParquetSink(sinkDir), new ParquetDlqSink(dlqDir), _ => ()),
        sinkDir)
    }

    // Warm-up: one full batch through a scratch orchestrator (JVM +
    // codegen + parquet-writer init — the same reason Bench warms up).
    freshOrchestrator()._1.processBatch(poll(0L), 0L)

    val (orch, sinkDir) = freshOrchestrator()
    val t0 = System.nanoTime()
    var rows = 0L
    (0L until nBatches).foreach { b =>
      orch.processBatch(poll(b), b)
      rows += orch.lastStats.flatMap(_.validRows).getOrElse(0L)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    val sunk = spark.read.parquet(sinkDir).count()
    require(sunk == rows && rows > 0,
      s"sink holds $sunk rows but orchestrator reported $rows")
    println(f"""{"metric":"ingest_rows_per_sec","value":${rows / dt}%.0f,"unit":"rows/s","rows":$rows,"batches":$nBatches,"batch_size":$batchSize,"elapsed_sec":$dt%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
