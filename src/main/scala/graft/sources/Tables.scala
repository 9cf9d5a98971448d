package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table readers. The only special case is `events`, whose `ts`
  * column is parquet TIMESTAMP(NANOS) — a type Spark's vectorized
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as
  * raw Long via the legacy conf and rebuild a microsecond timestamp
  * (integer division — no float rounding), which is what DuckDB's
  * µs-precision timestamps see for the same file.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Truncate ns→µs in integer arithmetic (`div`, not `/`: the ns
    // values are ~2^60, beyond double's exact range, so float division
    // is off by up to ±256 ns). Truncation matches DuckDB's ns→µs
    // conversion of the same file.
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
