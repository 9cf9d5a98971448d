package graft

import org.apache.spark.sql.functions._

/** Ground truth for the round-9 additions: the AVI container round
  * trip through the judged query (lossless, header metadata, exactly
  * one scene cut per clip), the banded-LSH recall differential (every
  * exact near-dup pair survives the bucketing at the judged dial),
  * and the codegen LshBucketKeys expression against a hand-computed
  * sign-bit construction.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q356 AVI decode ----------------------------------------------------

  test("avi decode: lossless round trips, header metadata, one cut per clip") {
    val rows = Queries.all("q356_avi_decode")(spark, sf()).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("lossless"), s"media ${r.getLong(0)} not lossless")
      assert(r.getAs[Long]("width") == 6L && r.getAs[Long]("height") == 4L)
      assert(r.getAs[Long]("fps_hdr") == (r.getLong(0) % 3 + 1) * 10,
        s"media ${r.getLong(0)} fps mangled")
      assert(r.getAs[Long]("n_frames") == 4L)
      assert(r.getAs[Long]("n_boundaries") == 3L)
      // the generator plants exactly one scene cut (at frame 2)
      assert(r.getAs[Long]("n_cuts") == 1L,
        s"media ${r.getLong(0)} expected exactly one cut")
    }
  }

  // ---- banded hyperplane LSH ----------------------------------------------

  test("banded LSH finds every exact pair at the judged dial (planted twins)") {
    import graft.operators.Dedup
    // 40 base vectors + twins at cosine ~0.985 — same construction as
    // q26, smaller so the exact all-pairs differential is instant.
    val base = spark.range(1, 41).toDF("id")
      .withColumn("v", transform(sequence(lit(0), lit(63)), j =>
        sin(col("id") * 7 + j.cast("double") * 13)))
    val twins = base.select((col("id") + 1000).as("id"),
      zip_with(col("v"), sequence(lit(0), lit(63)), (x, j) =>
        x + lit(0.015) * ((col("id") * 31 + j.cast("long") * 7) % 5 - 2)
          .cast("double")).as("v"))
    val corpus = base.unionByName(twins)
    val exact = Dedup.embeddingPairsExact(corpus, "id", "v", 0.95)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLshBanded(corpus, "id", "v",
        dim = 64, threshold = 0.95, numPlanes = 8, tables = 24)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "construction must plant near-dup pairs")
    assert(lsh == exact,
      s"banded LSH missed ${(exact -- lsh).size} of ${exact.size} exact pairs")
    spark.catalog.clearCache()
  }

  test("LshBucketKeys matches the hand-computed sign-bit construction") {
    import graft.expr.VectorExpressions
    val dim = 4
    val mat = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0), // table 0
      Array(0.0, 0.0, 1.0, 0.0), Array(-1.0, 0.0, 0.0, 0.0)) // table 1
    val df = Seq(
      (1L, Seq(0.5, -0.5, 0.25, 0.0)),
      (2L, Seq(-2.0, 3.0, -1.0, 4.0))).toDF("id", "v")
      .select(col("id"),
        VectorExpressions.lshBucketKeys(col("v"), mat, numPlanes = 2,
          tables = 2).as("keys"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // vec 1: t0 planes (x>=0 -> 1, y>=0 -> 0) = 0b01; t1 (z>=0 -> 1,
    // -x>=0 -> 0) = (1<<2)|0b01
    assert(got(1L) == Seq(1L, (1L << 2) | 1L))
    // vec 2: t0 (x<0, y>=0) = 0b10; t1 (z<0, -x>=0) = (1<<2)|0b10
    assert(got(2L) == Seq(2L, (1L << 2) | 2L))
  }
}
