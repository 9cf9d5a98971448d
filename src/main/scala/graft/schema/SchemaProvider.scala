package graft.schema

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.types.{CHType, ColumnMeta}

/** Schema discovery (reference S3, main.py:29-60): the reference runs
  * `DESCRIBE TABLE` against the ClickHouse sink at startup and on drift,
  * keeping (name, type, default_type, default_expression) per column.
  * In this engine the same role is a trait so the pipeline is testable
  * without a ClickHouse: the sink's schema is *fetched*, cached by the
  * orchestrator (main.py:421-425), and re-fetched on insert failure
  * (main.py:434-437).
  *
  * `db_insert_time` is excluded — ClickHouse fills it server-side
  * (main.py:168).
  */
trait SchemaProvider {
  /** One ColumnMeta per sink column, in sink DDL order (main.py:302:
    * the projection defines output column order = schema order).
    */
  def resolve(): Seq[ColumnMeta]

  final def resolveFiltered(): Seq[ColumnMeta] =
    resolve().filterNot(_.name == SchemaProvider.ExcludedColumn)

  final def structType(): StructType =
    StructType(resolveFiltered().map(m => StructField(m.name, m.dataType, nullable = true)))
}

object SchemaProvider {
  val ExcludedColumn = "db_insert_time"

  /** Fixture/DESCRIBE-shaped provider: rows of
    * (name, type, default_type, default_expression) exactly as ClickHouse
    * `DESCRIBE TABLE` returns them (main.py:59-60). Use with a DataFrame
    * read from any source, or directly from tuples in tests.
    */
  def fromDescribeRows(rows: Seq[(String, String)]): SchemaProvider =
    () => rows.map { case (name, chType) => CHType.columnMeta(name, chType) }

  /** DESCRIBE-result DataFrame → provider (columns `name`, `type`). */
  def fromDescribeDF(df: DataFrame): SchemaProvider = { () =>
    df.select("name", "type").collect().toSeq
      .map { case Row(n: String, t: String) => CHType.columnMeta(n, t) }
  }

  /** Parquet-footer provider for the offline harness: the sink is a
    * parquet table; its footer schema plays the role of DESCRIBE TABLE.
    */
  def fromParquet(spark: SparkSession, path: String): SchemaProvider = { () =>
    spark.read.parquet(path).schema.fields.toSeq.map { f =>
      CHType.columnMeta(f.name, CHType.fromSpark(f.dataType))
    }
  }

  /** Fixed provider (already-built metas), for tests. */
  def fixed(metas: Seq[ColumnMeta]): SchemaProvider = () => metas
}
