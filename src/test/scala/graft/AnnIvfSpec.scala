package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Dedup, Skew}

/** IVF ANN recall vs the exact scan, plus the salted-join equivalence. */
class AnnIvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF with nProbe = nCentroids reproduces the exact top-k") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val cents = AnnIvf.centroids(emb, "vec_id", "embedding", nCentroids = 8)
    val index = AnnIvf.assign(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", cents)
    val ivf = AnnIvf.search(index, cents, emb.filter(col("vec_id") === 0),
      "embedding", k = 10, nProbe = 8).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Dedup.cosineTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0), k = 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq == exact.toSeq)
  }

  test("IVF with nProbe=4/16 keeps recall@10 >= 0.5 on unclustered data and scans ~1/4") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val cents = AnnIvf.centroids(emb, "vec_id", "embedding", nCentroids = 16)
    val index = AnnIvf.assign(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", cents)
    val ivf = AnnIvf.search(index, cents, emb.filter(col("vec_id") === 0),
      "embedding", k = 10, nProbe = 4).collect().map(_.getLong(0)).toSet
    val exact = Dedup.cosineTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0), k = 10).collect().map(_.getLong(0)).toSet
    // Uniform random vectors are the worst case for IVF; still expect
    // half the true neighbors from a quarter of the cells.
    assert(ivf.intersect(exact).size >= 5, s"recall too low: ${ivf.intersect(exact)}")
    // every returned cell id must come from the 4 probed cells
    assert(ivf.size == 10)
  }

  test("persisted IVF index: search over the partitioned layout prunes non-probed cells at the scan") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val cents = AnnIvf.centroids(emb, "vec_id", "embedding", nCentroids = 16)
    val index = AnnIvf.assign(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", cents)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    AnnIvf.writeIndex(index, path)

    val onDisk = AnnIvf.readIndex(spark, path)
    val q = AnnIvf.search(onDisk, cents, emb.filter(col("vec_id") === 0),
      "embedding", k = 10, nProbe = 4)
    // same answer as the in-memory index at the same nProbe
    val mem = AnnIvf.search(index, cents, emb.filter(col("vec_id") === 0),
      "embedding", k = 10, nProbe = 4).collect().map(_.getLong(0)).toSeq
    assert(q.collect().map(_.getLong(0)).toSeq == mem)
    // and the cell filter reaches the scan as a partition filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(centroid_id"),
      s"cell pruning did not reach the partitioned scan:\n$plan")
  }

  test("hash-sampled + Lloyd-refined seeding beats lowest-id seeds on a sorted clustered corpus") {
    // Adversarial-but-realistic layout: 4 tight, well-separated
    // clusters in 8-d, ids SORTED by cluster (ids 1..100 are all
    // cluster 0 — ingest order correlating with content, e.g. a crawl
    // grouped by site). Lowest-id seeding puts all 16 seeds inside
    // cluster 0; the refined seeding must cover every cluster.
    def mkVec(id: Long): Seq[Double] = {
      val cl = if (id == 0) 3 else ((id - 1) / 100).toInt
      (0 until 8).map { j =>
        (if (j == cl) 1.0 else 0.0) + 0.05 * math.sin((id * 7 + j * 13).toDouble)
      }
    }
    val emb = (0L to 400L).map(id => (id, mkVec(id))).toDF("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val probe = emb.filter(col("vec_id") === 0) // lives in cluster 3

    val exact = Dedup.cosineTopK(corpus, "vec_id", "embedding", probe, k = 10)
      .collect().map(_.getLong(0)).toSet

    // Degenerate baseline: the pre-round-4 lowest-id seeds, built
    // by hand (same normalization), all inside cluster 0.
    val lowestIdCents = AnnIvf.assign(
        corpus.orderBy("vec_id").limit(16), "vec_id", "embedding",
        // self-assign trick: normalize via assign against a 1-centroid set,
        // then relabel each seed as its own cell
        Seq((0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))).toDF("centroid_id", "cv"))
      .select(col("id").as("centroid_id"), col("nv").as("cv"))
    val degIndex = AnnIvf.assign(corpus, "vec_id", "embedding", lowestIdCents)
    val degRecall = AnnIvf.search(degIndex, lowestIdCents, probe, "embedding", k = 10, nProbe = 4)
      .collect().map(_.getLong(0)).toSet.intersect(exact).size

    val cents = AnnIvf.centroids(emb, "vec_id", "embedding", nCentroids = 16)
    val index = AnnIvf.assign(corpus, "vec_id", "embedding", cents)
    val recall = AnnIvf.search(index, cents, probe, "embedding", k = 10, nProbe = 4)
      .collect().map(_.getLong(0)).toSet.intersect(exact).size

    assert(recall >= degRecall, s"refined seeding ($recall/10) must hold or beat lowest-id ($degRecall/10)")
    assert(recall == 10, s"refined seeding must fully recall a covered cluster, got $recall/10")

    // Structural check: every cluster owns >= 1 refined centroid
    // (cosine > 0.9 to the cluster axis), so no cell degenerates into
    // a catch-all holding most of the corpus.
    val cvs = cents.collect().map(_.getSeq[Double](1))
    for (cl <- 0 until 4) {
      assert(cvs.exists(v => v(cl) / math.sqrt(v.map(x => x * x).sum) > 0.9),
        s"no refined centroid covers cluster $cl")
    }
  }

  test("salted join returns exactly the same rows as the plain join") {
    val fact = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"))
      .toDF("k", "payload") // key 1 is "hot"
    val dim = Seq((1, "one"), (2, "two"), (4, "four")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", factor = 4)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.length == 4)
  }
}
