package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.types.{ColumnMeta, JsonKind}

/** Row validation (reference S5, `validate_json_rows` main.py:200-228 +
  * the generated JSON schema main.py:62-91, 170-175) as pure Catalyst
  * predicates — no UDFs, no row-at-a-time validator.
  *
  * Semantics of the compiled fastjsonschema validator, replicated:
  *   - `required` columns must have their key PRESENT in the object
  *     (a present JSON null satisfies `required` but then fails its
  *     type check — null is not integer/number/string);
  *   - every *present, non-null* declared property must match its
  *     JSON-token kind: integer / number / string / string-or-integer
  *     (main.py:81-91). Booleans fail integer/number (fastjsonschema
  *     excludes bool from int);
  *   - extra/undeclared keys pass (`additionalProperties` left
  *     permissive, main.py:174) and are dropped by the projection;
  *   - validation is per-row, all-or-nothing: the FIRST violation (in
  *     required-then-schema order) is the row's error message
  *     (main.py:222-227; fastjsonschema raises on the first failure).
  *
  * JSON token kinds are recovered from the VARIANT encoding via
  * `schema_of_variant`: parse_json stores JSON integers as
  * TINYINT..BIGINT or DECIMAL(p,0) (huge), floats as DECIMAL(p,s>0) or
  * DOUBLE, strings as STRING, booleans as BOOLEAN. Documented
  * divergence: a JSON `5.0` is stored as DECIMAL(1,0) and accepted as
  * integer — the JSON-Schema *spec* behavior (zero fractional part),
  * where fastjsonschema's isinstance(int) would reject it.
  */
object Validation {

  private def isIntegerType(t: Column): Column =
    t.isin("TINYINT", "SMALLINT", "INT", "BIGINT") ||
      (t.startsWith("DECIMAL(") && t.endsWith(",0)"))

  private def isNumberType(t: Column): Column =
    t.isin("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE") ||
      t.startsWith("DECIMAL(")

  /** Does a present, non-null variant field match the column's JSON kind? */
  def kindMatches(fieldV: Column, kind: JsonKind): Column = {
    val t = schema_of_variant(fieldV)
    kind match {
      case JsonKind.JInteger => isIntegerType(t)
      case JsonKind.JNumber  => isNumberType(t)
      case JsonKind.JString  => t === lit("STRING")
      case JsonKind.JEnum    => t === lit("STRING") || isIntegerType(t)
    }
  }

  def kindName(kind: JsonKind): String = kind match {
    case JsonKind.JInteger => "integer"
    case JsonKind.JNumber  => "number"
    case JsonKind.JString  => "string"
    case JsonKind.JEnum    => "string or integer"
  }

  /** First-failure error message for a row, or NULL if the row is valid.
    * Check order: required-presence checks (schema order), then
    * per-column type checks (schema order) — mirroring the single
    * exception fastjsonschema raises (main.py:224-227).
    */
  def errorColumn(v: Column, metas: Seq[ColumnMeta], cfg: PipelineConfig): Column = {
    val requiredSet = cfg.required.toSet
    val requiredChecks: Seq[(Column, String)] = metas
      .filter(m => requiredSet.contains(m.name))
      .map { m =>
        (Coercions.field(v, m.name).isNull,
          s"data must contain ['${m.name}'] properties")
      }
    val typeChecks: Seq[(Column, String)] = metas.map { m =>
      val f = Coercions.field(v, m.name)
      // present (key exists) but JSON-null or wrong token kind → fail
      (f.isNotNull && (is_variant_null(f) || !kindMatches(f, m.jsonKind)),
        s"data.${m.name} must be ${kindName(m.jsonKind)}")
    }
    (requiredChecks ++ typeChecks).foldRight(lit(null: String)) {
      case ((failCond, msg), acc) => when(failCond, lit(msg)).otherwise(acc)
    }
  }
}
