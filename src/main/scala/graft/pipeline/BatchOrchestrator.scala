package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.PipelineConfig
import graft.io.RecordSink
import graft.schema.SchemaProvider
import graft.types.ColumnMeta

/** The per-batch orchestrator with schema-drift retry (reference S10,
  * `process_packets` main.py:394-466):
  *
  *   1. schema cache miss → resolve once, reuse across batches
  *      (main.py:421-425);
  *   2. validate + coerce + insert (main.py:428-432);
  *   3. on insert failure: re-resolve the schema, re-validate the
  *      ORIGINAL payloads against it, retry the insert once
  *      (main.py:434-445);
  *   4. on second failure: the still-valid rows go to the DLQ as
  *      `{row: original payload, error}` envelopes (main.py:446-450);
  *   5. invalid rows go to the DLQ on every path (main.py:452-463).
  *
  * This is the body the streaming job hands to `foreachBatch`; it is
  * batch-scoped and deterministic — the only cross-batch state is the
  * cached schema, exactly like the reference (SURVEY §2.5).
  */
final class BatchOrchestrator(
    provider: SchemaProvider,
    cfg: PipelineConfig,
    validSink: RecordSink,
    dlqSink: RecordSink) extends Serializable {

  @volatile private var cachedMetas: Option[Seq[ColumnMeta]] = None
  /** Visible for tests: schema resolutions + insert attempts. */
  @volatile var schemaFetches: Int = 0
  @volatile var insertAttempts: Int = 0

  private def metas(): Seq[ColumnMeta] = cachedMetas.getOrElse {
    schemaFetches += 1
    val m = provider.resolveFiltered()
    cachedMetas = Some(m)
    m
  }

  private def refreshMetas(): Seq[ColumnMeta] = {
    cachedMetas = None
    metas()
  }

  def processBatch(raw: DataFrame, batchId: Long): Unit = {
    // The valid-row path is epoch-keyed (exactly-once under an
    // idempotent sink); DLQ writes stay at-least-once — duplicate
    // diagnostic envelopes on a redelivered batch are acceptable, as
    // in the reference (a retried batch re-produces to the DLQ topic).
    val res = Pipeline.process(raw, metas(), cfg)
    val firstFailure: Option[Exception] =
      try { insertAttempts += 1; validSink.write(res.valid, batchId); None }
      catch { case e: Exception => Some(e) }
    firstFailure match {
      case None =>
        dlqSink.write(res.dlq) // invalid → DLQ (main.py:452-456)
        res.release()
      case Some(_) =>
        // Schema drift path: rebuild schema, re-validate the ORIGINAL
        // payloads (not the already-coerced rows), retry the insert
        // once (main.py:434-445).
        val res2 = Pipeline.process(raw, refreshMetas(), cfg)
        try { insertAttempts += 1; validSink.write(res2.valid, batchId) }
        catch {
          case e2: Exception => // still-valid rows → DLQ (main.py:446-450)
            dlqSink.write(res2.validRaw.withColumn("error", lit(e2.getMessage)))
        }
        dlqSink.write(res2.dlq) // invalid → DLQ (main.py:459-463)
        res2.release()
        res.release()
    }
  }
}
