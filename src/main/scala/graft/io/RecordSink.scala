package graft.io

import org.apache.spark.sql.DataFrame

/** Sink abstraction (reference S8/S9, main.py:305-384). The reference
  * writes valid rows to ClickHouse via `insert_arrow` with async-insert
  * settings and DLQ envelopes to a second Kafka topic; neither service
  * exists in this environment, so sinks are a trait with parquet
  * implementations for the offline harness. A ClickHouse JDBC sink
  * would implement the same trait with `df.write.jdbc` + the
  * async_insert session settings (main.py:329-335) in the connection
  * properties; a Kafka DLQ sink with
  * `df.select(to_json(struct("*")).as("value")).write.format("kafka")`.
  */
trait RecordSink {
  /** Append one micro-batch. Must be idempotent-friendly: Structured
    * Streaming redelivers the whole batch on retry (at-least-once,
    * main.py:525-526 commit-after-process contract).
    */
  def write(df: DataFrame): Unit
}

/** Parquet append sink — the harness stand-in for ClickHouse (S8).
  * Empty batches are skipped with no write, matching the reference's
  * empty-batch no-op (main.py:337-339).
  */
final class ParquetSink(path: String) extends RecordSink {
  def write(df: DataFrame): Unit =
    if (!df.isEmpty) df.write.mode("append").parquet(path)
}

/** DLQ sink (S9): persists `{row, error}` envelopes (main.py:358-384). */
final class ParquetDlqSink(path: String) extends RecordSink {
  def write(df: DataFrame): Unit =
    if (!df.isEmpty) df.write.mode("append").parquet(path)
}

/** Test double: fails the first `failures` writes (simulating schema
  * drift / sink unavailability, main.py:431-434), then delegates.
  */
final class FlakySink(inner: RecordSink, failures: Int) extends RecordSink {
  private var remaining = failures
  var attempts: Int = 0
  def write(df: DataFrame): Unit = {
    attempts += 1
    if (remaining > 0) {
      remaining -= 1
      // Force evaluation first — a real sink fails mid-insert, after
      // the plan has run (Table has no columns matching the insert).
      df.count()
      throw new RuntimeException(s"simulated insert failure ($attempts)")
    }
    inner.write(df)
  }
}
