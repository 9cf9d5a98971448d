package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

/** Cross-document duplicated-SPAN detection — the n-gram-granular form
  * of ExactSubstr dedup (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better"): find maximal runs of consecutive
  * n-token windows shared verbatim between two documents, i.e. the
  * actual copied passages with their positions and lengths, which
  * set-level Jaccard/MinHash can't give you (they say THAT two docs
  * overlap, not WHERE or HOW LONG).
  *
  * Shape (all relational — no suffix array needed at n-gram grain):
  *  1. one fused codegen pass per doc → positional window hashes
  *     ([[graft.expr.PositionalShingleHashes]]; index = token offset);
  *  2. posexplode → (id, pos, h), then a df cap drops window hashes
  *     occurring > maxDf times corpus-wide — boilerplate n-grams would
  *     otherwise explode the self-join quadratically AND they are not
  *     the passages anyone wants (same contract as the containment
  *     join's stop-shingle cap: the cap DEFINES the vocabulary);
  *  3. self-join on h with a_id < b_id → matched positions (pa, pb);
  *  4. gaps-and-islands on each DIAGONAL (pa − pb): consecutive pa
  *     within a (a, b, diagonal) group are one span; run key =
  *     pa − row_number(). Span token length = run length + n − 1.
  *
  * 100 TB: step 2's shuffle is by hash with bounded fan-out (≤ maxDf
  * replication); step 4's window partitions by (a, b, diagonal) —
  * cardinality = matched pairs, never corpus size. The only data-
  * dependent blowup (a pair sharing everything) is inherent to
  * reporting its spans.
  */
object DupSpans {

  /** @param n             window width in tokens (8 ≈ the smallest
    *                      span that is rarely coincidental prose)
    * @param maxDf         drop window hashes with > maxDf occurrences
    * @param minSpanTokens report spans of at least this many tokens
    * @return (a_id, b_id, a_start, b_start, span_tokens), one row per
    *         maximal shared span (token offsets, 0-based)
    */
  def spans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Long = 20L, minSpanTokens: Int = 20): DataFrame = {
    require(minSpanTokens >= n, "a span is at least one window")
    // Persisted: the corpus-wide tokenize+window+hash explode feeds
    // the df-cap aggregate AND (through the join) both sides of the
    // self-join — the exchanges differ (partial-agg vs raw rows), so
    // ReuseExchange cannot collapse them and without the cache the
    // dominant per-row work runs 3×. Same multi-consumer shape (and
    // session-hygiene release contract) as SetSimJoin's inverted index.
    val pos = df
      .select(col(idCol).as("id"),
        posexplode(graft.expr.ShingleExpression.positionalShingleHashes(col(textCol), n))
          .as(Seq("pos", "h")))
      .persistTracked()
    // df cap: corpus-wide occurrence count (doc,pos granularity — a
    // doc repeating its own boilerplate counts each occurrence, same
    // as the oracle).
    val rare = pos
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("h")
    val idx = pos.join(rare, "h")
    val matched = idx.as("a").join(idx.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val diag = Window.partitionBy(col("a_id"), col("b_id"), (col("pa") - col("pb")))
      .orderBy("pa")
    matched
      .withColumn("run_key", col("pa") - row_number().over(diag))
      .groupBy(col("a_id"), col("b_id"), (col("pa") - col("pb")).as("d"), col("run_key"))
      .agg(min("pa").as("a_start"), min("pb").as("b_start"),
        (count(lit(1)) + (n - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select("a_id", "b_id", "a_start", "b_start", "span_tokens")
  }
}
