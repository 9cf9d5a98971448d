package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Mmr}

/** MMR re-rank: relevance anchor, diversity property, determinism. */
class MmrSpec extends SparkSpec {

  private def normed() = AnnIvf.normalized(
    spark.read.parquet(s"${sf()}/embeddings.parquet"), "vec_id", "embedding")

  private def probeNv(): Array[Double] =
    normed().filter(col("id") === 0)
      .select("nv").collect()(0).getSeq[Double](0).toArray

  test("first pick is the plain cosine top-1; all picks come from the candidate pool") {
    val base = normed().filter(col("id") =!= 0)
    val res = Mmr.rerank(spark, base, probeNv(), k = 10, nCandidates = 50, lambda = 0.7)
      .collect()
    assert(res.length == 10)
    val top1 = base
      .select(col("id"), graft.expr.VectorExpressions.dot(col("nv"),
        lit(probeNv()).cast("array<double>")).as("rel"))
      .orderBy(col("rel").desc, col("id")).limit(1).collect()(0).getLong(0)
    assert(res.head.getLong(1) == top1, "rank 1 must be the most relevant candidate")
    // ranks are 1..10, relevance non-increasing is NOT required (that's
    // the point of MMR) but mmr_score of rank1 >= rank2's
    assert(res.map(_.getInt(0)).toSeq == (1 to 10))
  }

  test("lambda=1 degenerates to the plain cosine top-k") {
    val base = normed().filter(col("id") =!= 0)
    val mmr = Mmr.rerank(spark, base, probeNv(), k = 10, nCandidates = 50, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    val plain = base
      .select(col("id"), graft.expr.VectorExpressions.dot(col("nv"),
        lit(probeNv()).cast("array<double>")).as("rel"))
      .orderBy(col("rel").desc, col("id")).limit(10).collect().map(_.getLong(0)).toSeq
    assert(mmr == plain)
  }

  test("diversity: MMR's picks are less mutually similar than the plain top-10 on a planted-redundancy corpus") {
    import spark.implicits._
    // 20 near-copies of one direction (pairwise sim ~1, relevance ~0.9
    // — STRICTLY below 1, so after the first copy is chosen the
    // redundancy penalty makes further copies lose to diverse picks)
    // plus 30 moderately relevant vectors on 30 DISTINCT axes (mutual
    // sim 0.36). Plain top-10 takes only near-copies; MMR must not.
    val d = 40
    val probe = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    val copies = (1 to 20).map { i =>
      (i.toLong, Array.tabulate(d)(j =>
        if (j == 0) 0.9 else if (j == d - 1) 0.436 else 0.0001 * i * (j % 3)))
    }
    val diverse = (21 to 50).map { i =>
      val axis = i - 20 // unique per vector: 1..30
      (i.toLong, Array.tabulate(d)(j =>
        if (j == 0) 0.6 else if (j == axis) 0.8 else 0.0))
    }
    val df = (copies ++ diverse).toDF("vec_id", "embedding")
    val base = AnnIvf.normalized(df, "vec_id", "embedding")
    def maxPairSim(ids: Seq[Long]): Double = {
      val vs = base.filter(col("id").isin(ids: _*)).select("nv").collect()
        .map(_.getSeq[Double](0).toArray)
      (for (i <- vs.indices; j <- vs.indices if i < j)
        yield vs(i).zip(vs(j)).map { case (a, b) => a * b }.sum).max
    }
    val plain = Mmr.rerank(spark, base, probe, 10, 50, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    val mmr = Mmr.rerank(spark, base, probe, 10, 50, lambda = 0.5)
      .collect().map(_.getLong(1)).toSeq
    assert(maxPairSim(mmr) < maxPairSim(plain) - 0.01,
      s"MMR did not diversify: ${maxPairSim(mmr)} vs ${maxPairSim(plain)}")
    assert(mmr.toSet.intersect(diverse.map(_._1).toSet).nonEmpty,
      "MMR must pick at least one diverse vector")
  }

  test("judged query q177 is deterministic across two runs") {
    val a = Queries.all("q177_mmr_rerank")(spark, sf()).collect().toSeq
    val b = Queries.all("q177_mmr_rerank")(spark, sf()).collect().toSeq
    assert(a == b && a.size == 10)
  }
}
