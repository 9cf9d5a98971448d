package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.expr.{Coercions, PipelineConfig, Validation}
import graft.types.ColumnMeta

/** One processed micro-batch: `valid` carries the coerced, sink-ready
  * rows (schema = sink schema, column order = schema order); `dlq`
  * carries `{row, error}` envelopes (reference main.py:227, 450) where
  * `row` is the original JSON payload string.
  *
  * Call [[release]] after both sides have been materialized — the split
  * shares one persisted parse of the input.
  */
final case class BatchResult(
    valid: DataFrame,
    dlq: DataFrame,
    validRaw: DataFrame,
    private val parsed: DataFrame) {
  def release(): Unit = parsed.unpersist()
}

/** The per-batch pipeline (reference S2→S6, main.py:394-466 inner body):
  *
  *   raw value:String
  *     → drop null/whitespace-only payloads            (S2, main.py:519)
  *     → try_parse_json → VARIANT                      (S2, main.py:520)
  *         malformed JSON → DLQ "malformed JSON"       (divergence: the
  *         reference's unwrapped orjson.loads would crash the whole
  *         batch, main.py:517 — we divert the row instead)
  *     → validate (first-violation error per row)      (S5, main.py:200-228)
  *     → split valid / invalid                         (main.py:221-228)
  *     → coerce valid rows, one columnar select        (S6, main.py:230-302)
  *
  * Everything is Catalyst expressions over one persisted DataFrame; the
  * only driver-side step is the (tiny) batch-presence aggregate that
  * replicates Polars' batch-level column union (main.py:257, 265).
  */
object Pipeline {

  val ValueCol = "value"
  private val V = "__graft_variant"
  private val Err = "__graft_error"

  /** Which sink columns appear (key present) in at least one row of the
    * batch — the analogue of `source_df.columns` after
    * `pl.DataFrame(rows)` (main.py:257, 265). One map-side-combined
    * aggregate, collected to the driver (bounded by #columns, not rows).
    */
  def presentColumns(parsed: DataFrame, metas: Seq[ColumnMeta]): Set[String] = {
    if (metas.isEmpty) return Set.empty
    val aggs = metas.map(m =>
      max(when(Coercions.field(col(V), m.name).isNotNull, 1).otherwise(0)).alias(m.name))
    val row = parsed.filter(col(V).isNotNull).agg(aggs.head, aggs.tail: _*).collect()(0)
    metas.indices.collect { case i if !row.isNullAt(i) && row.getInt(i) == 1 => metas(i).name }.toSet
  }

  /** Process one batch of raw JSON payloads (column [[ValueCol]]).
    *
    * @param share persist the parsed batch so the valid/DLQ sides and
    *              the batch-presence aggregate reuse one parse (the
    *              streaming/orchestrator shape — call `release()` when
    *              both sides are materialized). Pass false for
    *              single-consumer batch use, where the cache would
    *              never be reused and never be freed.
    */
  def process(
      raw: DataFrame,
      metas: Seq[ColumnMeta],
      cfg: PipelineConfig,
      share: Boolean = true): BatchResult = {
    val value = col(ValueCol).cast("string")
    // Python str.strip() strips all ASCII whitespace; Spark's 1-arg trim
    // strips spaces only — pass the trim set explicitly (main.py:519).
    val nonEmpty = raw.filter(
      value.isNotNull && length(trim(value, " \t\n\r\f")) > lit(0))
    val parsedPlan = nonEmpty
      .withColumn(V, try_parse_json(value))
      .withColumn(Err,
        when(col(V).isNull, lit("malformed JSON"))
          .otherwise(Validation.errorColumn(col(V), metas, cfg)))
    val parsed =
      if (share) parsedPlan.persist(StorageLevel.MEMORY_AND_DISK) else parsedPlan

    val batchPresent: Option[Set[String]] =
      if (cfg.compatBatchPresence) Some(presentColumns(parsed, metas)) else None

    val coercions: Seq[Column] =
      Coercions.selectList(col(V), metas, cfg, batchPresent)

    val valid = parsed.filter(col(Err).isNull).select(coercions: _*)
    val dlq = parsed
      .filter(col(Err).isNotNull)
      .select(value.as("row"), col(Err).as("error"))
    // Original payloads of the VALID rows — the reference pushes these
    // (not the coerced form) to the DLQ if the post-retry insert still
    // fails (main.py:446-450).
    val validRaw = parsed.filter(col(Err).isNull).select(value.as("row"))
    BatchResult(valid, dlq, validRaw, parsed)
  }
}
