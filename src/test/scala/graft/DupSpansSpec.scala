package graft

import org.apache.spark.sql.functions._

import graft.operators.DupSpans

/** Duplicated-span detection: positional-hash parity with the
  * composable form, planted-span geometry, df cap, and span splitting.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  test("positional shingle hashes equal the composable transform form over the real corpus") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val n = 5
    // Composable reference: per starting index, xxhash64 of the
    // space-joined n-token window (duplicates kept, position order).
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val composed = transform(
      sequence(lit(0), size(toks) - n), // only evaluated when size >= n
      i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n)))))
    val fused = graft.expr.ShingleExpression.positionalShingleHashes(col("text"), n)
    val diff = docs
      .select(
        when(size(toks) >= n, composed).otherwise(array().cast("array<bigint>")).as("c"),
        fused.as("f"))
      .filter(not(col("c") <=> col("f")))
      .count()
    assert(diff == 0)
  }

  test("a planted copied passage is reported with exact positions and length") {
    val passage = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"x1 x2 x3 x4 x5 $passage y1 y2"),
      (3L, "completely different content with no overlap at all here")
    ).toDF("doc_id", "text")
    val res = DupSpans.spans(docs, "doc_id", "text",
      n = 8, maxDf = 20L, minSpanTokens = 20).collect()
    assert(res.length == 1)
    val r = res.head
    // passage starts at token 2 in doc 1, token 5 in doc 2, 30 tokens
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getInt(2) == 2 && r.getInt(3) == 5)
    assert(r.getLong(4) == 30L)
  }

  test("span shorter than minSpanTokens is dropped; equal-length is kept") {
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage tail1 tail2"),
      (2L, s"head1 $passage")
    ).toDF("doc_id", "text")
    assert(DupSpans.spans(docs, "doc_id", "text", n = 8, maxDf = 20L,
      minSpanTokens = 20).count() == 1)
    assert(DupSpans.spans(docs, "doc_id", "text", n = 8, maxDf = 20L,
      minSpanTokens = 21).count() == 0)
  }

  test("df cap drops boilerplate windows: a passage shared by many docs vanishes, a rare one stays") {
    val boiler = (1 to 25).map(i => s"b$i").mkString(" ")
    val rare = (1 to 25).map(i => s"r$i").mkString(" ")
    val many = (1L to 12L).map(i => (i, s"doc$i filler $boiler"))
    val pair = Seq((100L, s"one $rare"), (101L, s"two $rare"))
    val docs = (many ++ pair).toDF("doc_id", "text")
    // boilerplate windows occur 12 times > maxDf=10 → dropped; the
    // rare passage occurs twice → kept.
    val res = DupSpans.spans(docs, "doc_id", "text",
      n = 8, maxDf = 10L, minSpanTokens = 20).collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)))
  }

  test("a df-capped window INSIDE a span splits it in two (documented contract)") {
    // Shared 30-token passage, but its middle window is also pasted
    // into many other docs → that window's df exceeds the cap and the
    // span splits around it.
    val p = (1 to 30).map(i => s"s$i").mkString(" ")
    val midWindow = (12 to 19).map(i => s"s$i").mkString(" ") // tokens 11..18 0-based
    val spam = (10L to 25L).map(i => (i, s"noise${i}a noise${i}b $midWindow noise${i}c"))
    val docs = (Seq((1L, p), (2L, s"pre1 pre2 $p")) ++ spam).toDF("doc_id", "text")
    val res = DupSpans.spans(docs, "doc_id", "text",
      n = 8, maxDf = 10L, minSpanTokens = 8)
      .filter(col("a_id") === 1L && col("b_id") === 2L)
      .orderBy("a_start").collect()
    assert(res.length == 2, s"expected a split span, got ${res.mkString(",")}")
    assert(res.map(_.getLong(4)).forall(_ < 30))
  }
}
