package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Differential ground truth for the fused native tokenizer
  * (graft.expr.Tokens): it must be row-for-row identical to the
  * composable `filter(split(lower(text), "\\s+"), _ =!= "")` form it
  * replaced — over the full documents fixture AND the whitespace /
  * case / null edge cases a fixture corpus may never hit.
  */
class TokensSpec extends SparkSpec {
  import spark.implicits._

  test("native tokens == HOF tokens over the full documents table") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val diff = docs.select(
        TextFunctions.tokens(col("text")).as("a"),
        TextFunctions.tokensHof(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() === 0L)
  }

  test("schema parity: native tokens declares the SAME array type as the HOF form") {
    // Not just value equality: unionByName of the two forms, strict
    // writers, and schema asserts see dataType (incl. containsNull).
    val df = Seq("a b").toDF("text").select(
      TextFunctions.tokens(col("text")).as("a"),
      TextFunctions.tokensHof(col("text")).as("b"))
    assert(df.schema("a").dataType === df.schema("b").dataType)
  }

  test("edge cases: empties, pure whitespace, mixed separators, unicode, null") {
    val rows = Seq(
      "",                       // empty → empty array
      "   ",                    // pure spaces → empty array
      "\t\n\r\f\u000B",         // every \s class char → empty array
      "  leading",              // leading-empty artifact of split
      "trailing  ",
      "a\tb\nc\rd\fe\u000Bf",   // each separator kind splits
      "Mixed CASE Text",        // lowercasing
      "un break",          // NBSP is NOT \s → stays inside token
      "cafÉ  Über",   // unicode lowercase É→é Ü→ü
      "a  b   c",               // separator runs collapse
      "single")
    val df = rows.toDF("text")
      .union(Seq.empty[String].toDF("text"))
      .union(spark.sql("SELECT CAST(NULL AS STRING) AS text"))
    val diff = df.select(
        TextFunctions.tokens(col("text")).as("a"),
        TextFunctions.tokensHof(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() === 0L)
    // And pin a couple of absolute expectations, not just equivalence.
    val got = df.filter(col("text") === "a\tb\nc\rd\fe\u000Bf")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].head()
    assert(got === Seq("a", "b", "c", "d", "e", "f"))
    val nbsp = df.filter(col("text") === "un break")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].head()
    assert(nbsp === Seq("un break"))
    val nul = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(TextFunctions.tokens(col("text")).as("t")).filter(col("t").isNull)
    assert(nul.count() === 1L)
  }

  test("fused pretokens == regexp_extract_all form over the full documents table") {
    import graft.expr.PretokenizeExpression.pretokens
    val regexForm = regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
    val diff = df
      .select(pretokens(col("text")).as("a"), regexForm.as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() === 0L)
  }

  test("pretokens edge cases: contractions, digit splits, unicode singles, surrogate pairs, null") {
    import spark.implicits._
    import graft.expr.PretokenizeExpression.pretokens
    val regexForm = regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    val cases = Seq(
      "Don't x2!!",
      "",                 // empty → empty array
      "   \t\n ",         // pure separators → empty array
      "ab12cd",           // digit run splits letter runs
      "héllo wörld",      // accented letters are per-char "other"
      "中文 分词",          // CJK per character
      "un break",    // NBSP is NOT \s → an "other" token
      "a😀b",   // emoji surrogate pair stays one token
      "MiXeD CaSe")
    val df = cases.toDF("text")
    val diff = df.select(pretokens(col("text")).as("a"), regexForm.as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() === 0L, diff.collect().mkString("; "))
    val got = df.filter(col("text") === "a😀b")
      .select(pretokens(col("text"))).as[Seq[String]].head()
    assert(got === Seq("a", "😀", "b"))
    val nul = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(pretokens(col("text")).as("t")).filter(col("t").isNull)
    assert(nul.count() === 1L)
  }
}
