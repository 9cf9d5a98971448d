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

  /** LIVE provider against a real store over JDBC: reads the table's
    * columns through `DatabaseMetaData.getColumns` — the JDBC-portable
    * `DESCRIBE TABLE` (the reference runs the ClickHouse statement,
    * main.py:51-60; the metadata call returns the same
    * name/type/ordinal rows, ordered by ORDINAL_POSITION per the JDBC
    * spec). Resolution happens at `resolve()` time, a fresh connection
    * per call, so the orchestrator's drift re-resolve observes
    * server-side ALTERs — exercised in-process against embedded Derby
    * (the JDBC engine Spark already ships for its Hive metastore); a
    * ClickHouse JDBC URL plugs in unchanged.
    */
  def fromJdbc(url: String, table: String, schema: Option[String] = None): SchemaProvider =
    { () =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val md = conn.getMetaData
        // getColumns takes LIKE patterns: a literal '_' in a table name
        // like sink_t would otherwise match ANY character (and a null
        // schema pattern spans every schema), silently concatenating
        // columns of unrelated tables into one "schema". Escape the
        // metacharacters with the driver's own escape string.
        val esc = md.getSearchStringEscape
        def quote(name: String): String = name.flatMap {
          case c @ ('_' | '%') => s"$esc$c"
          case c if esc.length == 1 && c == esc.head => s"$esc$c"
          case c => c.toString
        }
        val schemaPat = schema.map(quote).orNull
        // Identifier case is store-specific: Derby/most SQL stores fold
        // unquoted DDL names UPPER, ClickHouse/Postgres keep or fold
        // lower. Try the exact name first, then the folded variants.
        def lookup(name: String): Seq[((String, String), Seq[ColumnMeta])] = {
          val rs = md.getColumns(null, schemaPat, quote(name), null)
          val byTable = scala.collection.mutable.LinkedHashMap
            .empty[(String, String), scala.collection.mutable.ArrayBuffer[ColumnMeta]]
          while (rs.next()) {
            val key = (Option(rs.getString("TABLE_SCHEM")).getOrElse(""),
              rs.getString("TABLE_NAME"))
            byTable.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty) +=
              CHType.columnMeta(
                rs.getString("COLUMN_NAME").toLowerCase,
                chTypeOfJdbc(rs.getInt("DATA_TYPE")))
          }
          // The escaped pattern is only a pre-filter: some drivers
          // (Derby among them) ignore the escape character in metadata
          // patterns, so SINK\_T still LIKE-matches SINKXT. Exact
          // TABLE_NAME equality is the authoritative check.
          byTable.toSeq.collect { case (k @ (_, tn), v) if tn == name => (k, v.toSeq) }
        }
        val hits = Seq(table, table.toUpperCase, table.toLowerCase).distinct
          .iterator.map(lookup).find(_.nonEmpty)
          .getOrElse(throw new IllegalArgumentException(
            s"JDBC DESCRIBE: table $table not found or has no columns"))
        require(hits.size == 1,
          s"JDBC DESCRIBE: table $table is ambiguous, matches " +
            hits.map { case ((s, t), _) => s"$s.$t" }.mkString(", ") +
            " — pass the schema name to disambiguate")
        hits.head._2
      } finally conn.close()
    }

  /** java.sql.Types → the CH type vocabulary CHType already compiles
    * (same targets as CHType.fromSpark).
    */
  private def chTypeOfJdbc(jdbcType: Int): String = {
    import java.sql.Types._
    jdbcType match {
      case BIGINT                            => "Int64"
      case INTEGER                           => "Int32"
      case SMALLINT                          => "Int16"
      case TINYINT                           => "Int8"
      case REAL                              => "Float32"
      case FLOAT | DOUBLE                    => "Float64"
      case DECIMAL | NUMERIC                 => "UInt64"
      case DATE                              => "Date"
      case TIMESTAMP                         => "DateTime"
      case CHAR | VARCHAR | LONGVARCHAR | CLOB => "String"
      case other =>
        throw new IllegalArgumentException(s"no CH mapping for JDBC type $other")
    }
  }
}
