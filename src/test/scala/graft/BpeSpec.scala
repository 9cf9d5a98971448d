package graft

import graft.operators.Bpe

/** BPE merge learning (q193): hand-computed merges on a crafted
  * word-frequency table, the greedy left-to-right rewrite semantics on
  * runs ("aaaa" + pair (a,a) -> ["aa","aa"]), and a differential
  * pinning the distributed learner to the driver-local reference over
  * real corpus data.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed merges on a crafted vocabulary") {
    // "low"x5, "lower"x2, "newest"x6, "widest"x3  (the Sennrich
    // walkthrough shape). Pair counts round 1: (e,s)=9, (s,t)=9,
    // (l,o)=7, (o,w)=7, ... argmax ties (e,s)/(s,t) at 9 -> (e,s) by
    // ascending pair order. Round 2: ("es","t")=9 wins. Round 3:
    // (l,o)=7 and (o,w)=7 tie -> (l,o).
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
    val got = Bpe.learnMerges(wc, k = 3)
    assert(got == Seq(
      Bpe.Merge(1, "e", "s", 9L),
      Bpe.Merge(2, "es", "t", 9L),
      Bpe.Merge(3, "l", "o", 7L)))
  }

  test("greedy left-to-right rewrite: 'aaaa' with pair (a,a) yields two 'aa' symbols") {
    // After merge 1 ((a,a), freq 6 = 3 adjacent pairs x count 2),
    // "aaaa" is ["aa","aa"] so round 2's top pair is ("aa","aa").
    val wc = Seq(("aaaa", 2L)).toDF("word", "n")
    val got = Bpe.learnMerges(wc, k = 2)
    assert(got == Seq(
      Bpe.Merge(1, "a", "a", 6L),
      Bpe.Merge(2, "aa", "aa", 2L)))
  }

  test("local reference implementation agrees on the crafted vocabulary") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(Bpe.learnMergesLocal(words, 3) == Seq(
      Bpe.Merge(1, "e", "s", 9L),
      Bpe.Merge(2, "es", "t", 9L),
      Bpe.Merge(3, "l", "o", 7L)))
    assert(Bpe.learnMergesLocal(Map("aaaa" -> 2L), 2) == Seq(
      Bpe.Merge(1, "a", "a", 6L),
      Bpe.Merge(2, "aa", "aa", 2L)))
  }

  test("distributed == local reference on the sf0.001 documents corpus") {
    val wcDf = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("word"))
      .groupBy("word").count().withColumnRenamed("count", "n")
    val local = wcDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.learnMergesLocal(local, 5)
    val got = Bpe.learnMerges(wcDf, 5)
    assert(got == want)
    assert(got.size == 5)
    // Frequencies must be non-increasing is NOT guaranteed for BPE in
    // general (a merge can create a new high-frequency pair), but each
    // chosen pair's freq must be positive.
    assert(got.forall(_.freq > 0))
  }

  test("q193 runs and returns 5 ordered merges") {
    val df = Queries.all("q193_bpe_merges")(spark, sf())
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("q192 DSIR: weights favor target-like documents and the top-k is deterministic") {
    val df = Queries.all("q192_dsir_select")(spark, sf())
    val rows = df.collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getString(1) != "en"), "pool excludes the target slice")
    // Descending weight with doc_id tiebreak.
    val ws = rows.map(r => (r.getDouble(3), r.getLong(0)))
    assert(ws.sliding(2).forall { case Array((w1, d1), (w2, d2)) =>
      w1 > w2 || (w1 == w2 && d1 < d2) })
  }
}
