package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.BatchOrchestrator

/** The service loop (reference §3.1, main.py:468-534) as a Structured
  * Streaming job: `readStream → foreachBatch(orchestrator) → commit`.
  * Structured Streaming's micro-batch engine replaces the hand-written
  * consume/process/commit loop — the checkpoint WAL provides the same
  * at-least-once, commit-after-process contract as the reference's
  * `consumer.commit(asynchronous=True)` (main.py:525-526, S11).
  *
  * The input `raw` streaming DataFrame must expose the payload column
  * `Pipeline.ValueCol`. Sources:
  *   - tests/harness: `MemoryStream[String]` or a file stream
  *     (`spark.readStream.text(dir)`);
  *   - production (documented — no kafka connector jar ships here):
  *     `spark.readStream.format("kafka")
  *        .option("kafka.bootstrap.servers", env.KAFKA_HOST)
  *        .option("subscribe", env.SOURCE_TOPIC)
  *        .option("maxOffsetsPerTrigger", env.NUM_MESSAGES)  // 25000, main.py:569
  *        .option("kafka.fetch.max.bytes", 50*1024*1024)     // main.py:496
  *        .option("startingOffsets", env.AUTO_OFFSET_RESET)  // main.py:498
  *        .load().selectExpr("CAST(value AS STRING) AS value")`
  */
object StreamJob {

  def start(
      raw: DataFrame,
      orchestrator: BatchOrchestrator,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    raw.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        orchestrator.processBatch(batch, id)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
