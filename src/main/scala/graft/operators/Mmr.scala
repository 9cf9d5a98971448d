package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98) —
  * the diversity-aware top-k every RAG retrieval stack runs after its
  * ANN pass: greedily pick the candidate maximizing
  * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)`.
  *
  * Split exactly like AnnIvf's Lloyd step: the DISTRIBUTED part is the
  * candidate retrieval (cosine top-`nCandidates` over the full corpus,
  * TakeOrderedAndProject — scales to any corpus size), the DRIVER part
  * is the greedy selection over those `nCandidates` vectors — an
  * inherently sequential O(k·n·d) loop over a bounded set
  * (50×64 doubles here), which no amount of cluster would parallelize
  * better. At 100 TB only the retrieval cost grows; the driver loop is
  * constant.
  *
  * Determinism: candidate top-k breaks ties by (−sim, id); the greedy
  * argmax breaks score ties toward the lower candidate id.
  */
object Mmr {

  /** @param normed  (id, nv) unit-normalized corpus ([[AnnIvf.normalized]])
    * @param probeNv unit-normalized query vector
    * @return (rank, id, relevance, mmr_score) — `relevance` is cosine
    *   to the probe; `mmr_score` the value that selected the row.
    */
  def rerank(spark: SparkSession, normed: DataFrame, probeNv: Array[Double],
      k: Int, nCandidates: Int, lambda: Double): DataFrame = {
    import spark.implicits._
    val cand = normed
      .select(col("id").cast("long").as("id"),
        graft.expr.VectorExpressions.dot(col("nv"),
          lit(probeNv).cast("array<double>")).as("rel"),
        col("nv"))
      .orderBy(col("rel").desc, col("id"))
      .limit(nCandidates)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    while (selected.length < math.min(k, cand.length)) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < remaining.length) {
        val (id, rel, v) = remaining(i)
        val redundancy = if (chosen.isEmpty) 0.0 else chosen.map(cos(v, _)).max
        val score = lambda * rel - (1 - lambda) * redundancy
        val cmp = java.lang.Double.compare(score, bestScore)
        if (cmp > 0 || (cmp == 0 && bestIdx >= 0 && id < remaining(bestIdx)._1)) {
          bestScore = score; bestIdx = i
        }
        i += 1
      }
      val (id, rel, v) = remaining.remove(bestIdx)
      selected += ((id, rel, bestScore))
      chosen += v
    }

    selected.zipWithIndex.map { case ((id, rel, score), i) =>
      (i + 1, id, math.rint(rel * 10000) / 10000, math.rint(score * 10000) / 10000)
    }.toSeq.toDF("rank", "id", "relevance", "mmr_score")
  }
}
