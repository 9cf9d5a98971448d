package graft.types

import org.apache.spark.sql.types._

/** The JSON-Schema "kind" the reference derives from a ClickHouse type
  * string for row validation (reference: main.py:62-91,
  * `ch_type_to_json_schema`). Validation is by JSON *token* type:
  * `JInteger` accepts only JSON integers (not `"5"`, not `5.5`, not
  * booleans — fastjsonschema excludes bool from int), `JNumber` accepts
  * integers and floats, `JString` accepts only JSON strings, `JEnum`
  * accepts strings or integers (anyOf, main.py:89-90).
  */
sealed trait JsonKind
object JsonKind {
  case object JInteger extends JsonKind
  case object JNumber  extends JsonKind
  case object JString  extends JsonKind
  case object JEnum    extends JsonKind
}

/** Engine schema IR: one sink column.
  *
  * @param name     column name
  * @param chType   original ClickHouse type string (e.g. "LowCardinality(String)")
  * @param dataType Spark physical type (SURVEY §1.2(b) mapping)
  * @param default  sentinel default used for null-fill / missing columns
  *                 (a Scala value convertible with `lit`, or for
  *                 date/timestamp a java.sql value)
  * @param jsonKind validation kind (SURVEY §1.2(a) mapping)
  */
final case class ColumnMeta(
    name: String,
    chType: String,
    dataType: DataType,
    default: Any,
    jsonKind: JsonKind)

/** ClickHouse type-string → (Spark DataType, sentinel default, JsonKind).
  *
  * Mirrors the reference's two parallel mappings
  * (`ch_type_to_json_schema` main.py:62-91 and the dtype/default tables
  * in `build_json_schema_and_meta` main.py:116-165) with the Spark
  * physical types chosen in SURVEY §1.2(b):
  *
  *  - signed ints map 1:1 (Byte/Short/Integer/Long);
  *  - unsigned ints widen (UInt8→Short, UInt16→Int, UInt32→Long) since
  *    Spark has no unsigned types;
  *  - UInt64 → Decimal(20,0), the only lossless container;
  *  - Enum → ShortType carrying the reference's UInt8 code default 127
  *    (main.py:128,156-157) — overridden to String/"DEFAULT" at
  *    transform time for STRING_ENUM_COLUMNS (main.py:275-281);
  *  - unknown types raise (stricter than the reference, which prints
  *    and stores ("UnknownType", None), main.py:163-165 — a deliberate,
  *    documented divergence: analysis-time failure beats runtime NPE).
  *
  * Dispatch order replicates main.py:153-165 exactly: `Enum` substring
  * first, then `String`/`UUID` substring (covers LowCardinality(String),
  * Nullable(String)), then exact match on the bare-type table.
  */
object CHType {

  val Uint64Default: java.math.BigDecimal = new java.math.BigDecimal("18446744073709500000")
  val EpochTs: java.sql.Timestamp = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
  val EpochDate: java.sql.Date = java.sql.Date.valueOf("1970-01-01")

  /** Exact bare-type table (main.py:135-149 + defaults main.py:116-131). */
  private val exact: Map[String, (DataType, Any)] = Map(
    "Int8"     -> (ByteType, -127.toByte),
    "Int16"    -> (ShortType, -32767.toShort),
    "Int32"    -> (IntegerType, -2147483647),
    "Int64"    -> (LongType, -9223372036854775808L),
    "UInt8"    -> (ShortType, 255.toShort),
    "UInt16"   -> (IntegerType, 65535),
    "UInt32"   -> (LongType, 4294967295L),
    "UInt64"   -> (DecimalType(20, 0), Uint64Default),
    "Float32"  -> (FloatType, 2_000_000_000.0f),
    "Float64"  -> (DoubleType, 999_999_999_999_999.9),
    "Date"     -> (DateType, EpochDate),
    "DateTime" -> (TimestampType, EpochTs),
  )

  /** Strip `Nullable(...)`/`LowCardinality(...)` wrappers before bare-
    * type lookup. The reference handles wrapped String/UUID/Enum via
    * substring match but maps e.g. `Nullable(Int64)` to UnknownType and
    * would crash downstream (main.py:163-165 prints and stores None);
    * unwrapping is the documented, strictly-more-useful divergence.
    */
  private def unwrap(chType: String): String = {
    val wrapped = "^(?:Nullable|LowCardinality)\\((.+)\\)$".r
    chType match {
      case wrapped(inner) => unwrap(inner)
      case other => other
    }
  }

  /** Physical mapping: (Spark type, sentinel default). */
  def toSpark(chType: String): (DataType, Any) =
    if (chType.contains("Enum")) (ShortType, 127.toShort)
    else if (chType.contains("String") || chType.contains("UUID")) (StringType, "")
    else exact.getOrElse(
      unwrap(chType),
      throw new IllegalArgumentException(s"Unknown ClickHouse type: $chType"))

  /** Validation mapping (main.py:62-91): lower-cased substring dispatch,
    * in source order. Note "uint64" hits the `int` branch; "datetime"
    * hits the `date` branch; anything unmatched falls back to string.
    */
  def toJsonKind(chType: String): JsonKind = {
    val t = chType.toLowerCase
    if (t.contains("int")) JsonKind.JInteger
    else if (t.contains("float") || t.contains("decimal")) JsonKind.JNumber
    else if (t.contains("date")) JsonKind.JString
    else if (t.contains("string") || t.contains("uuid")) JsonKind.JString
    else if (t.contains("enum")) JsonKind.JEnum
    else JsonKind.JString
  }

  def columnMeta(name: String, chType: String): ColumnMeta = {
    val (dt, default) = toSpark(chType)
    ColumnMeta(name, chType, dt, default, toJsonKind(chType))
  }

  /** Spark DataType → a reasonable CH-ish type string, used when the
    * schema is discovered from a parquet footer rather than a ClickHouse
    * DESCRIBE (SchemaProvider). Inverse-ish of [[toSpark]].
    */
  def fromSpark(dt: DataType): String = dt match {
    case ByteType         => "Int8"
    case ShortType        => "Int16"
    case IntegerType      => "Int32"
    case LongType         => "Int64"
    case FloatType        => "Float32"
    case DoubleType       => "Float64"
    case DateType         => "Date"
    case TimestampType    => "DateTime"
    case _: DecimalType   => "UInt64"
    case StringType       => "String"
    case other => throw new IllegalArgumentException(s"No CH mapping for Spark type $other")
  }
}
