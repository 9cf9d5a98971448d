package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, Pq}

/** IVF-PQ: planted-cluster recall, the residual-quantization edge over
  * raw PQ, and cell-pruned scan shape.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // 8 tight clusters in 32-d on distinct offsets; probe = member 0 of
  // cluster 0; its true top-k are its siblings.
  private def planted() = {
    val d = 32
    (0 until 120).map { i =>
      val cl = i % 8
      (i.toLong, Array.tabulate(d)(j =>
        cl * 4.0 + math.sin(j * 0.9) + 0.02 * ((i * 17 + j) % 5)))
    }
  }

  test("recall@10 = 1.0 on planted clusters with nProbe=2 of 8 cells") {
    val vecs = planted()
    val df = vecs.toDF("vec_id", "embedding")
    val idx = IvfPq.build(df.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      nCells = 8, m = 4, k = 16)
    val res = IvfPq.search(idx, vecs.head._2, kTop = 10, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    val siblings = vecs.tail.filter(_._1 % 8 == 0).map(_._1).toSet
    // 120/8 = 15 members per cluster; top-10 must all be siblings.
    assert(res.subsetOf(siblings), s"non-sibling in top-10: ${res -- siblings}")
    assert(res.size == 10)
  }

  test("residual PQ approximates distances strictly better than raw-vector PQ on clustered data") {
    // The entire point of IVFADC: residuals concentrate near the
    // origin, so the same m x k budget quantizes finer. Compare mean
    // |adc - exact| over the corpus for the SAME probe.
    val vecs = planted()
    val df = vecs.toDF("vec_id", "embedding")
    val base = df.filter(col("vec_id") =!= 0)
    val probeRaw = vecs.head._2
    val nrm = math.sqrt(probeRaw.map(x => x * x).sum)
    val qn = probeRaw.map(_ / nrm)

    // IVF-PQ: per-cell ADC over all cells (nProbe = nCells -> every
    // row scored), joined to exact normalized distance.
    val idx = IvfPq.build(base, "vec_id", "embedding", nCells = 8, m = 4, k = 16)
    val ivfAdc = IvfPq.search(idx, probeRaw, kTop = 200, nProbe = 8)

    // Raw PQ on the same normalized space with the same m x k budget.
    val normed = graft.operators.AnnIvf.normalized(base, "vec_id", "embedding")
    val cb = Pq.train(normed, "id", "nv", m = 4, k = 16)
    val rawAdc = Pq.searchTopK(Pq.encode(normed, "id", "nv", cb), cb, qn, 200)

    val exact = normed.select(col("id"),
      (lit(2.0) - lit(2.0) * graft.expr.VectorExpressions.dot(col("nv"),
        lit(qn).cast("array<double>"))).as("exact"))
    def meanErr(adc: org.apache.spark.sql.DataFrame): Double =
      adc.join(exact, "id")
        .agg(avg(abs(col("adc_dist") - col("exact")))).collect()(0).getDouble(0)
    val (rErr, pErr) = (meanErr(ivfAdc), meanErr(rawAdc))
    assert(rErr < pErr, s"residual PQ not finer: ivfpq=$rErr raw=$pErr")
  }

  test("search with nProbe=1 scans exactly one cell's codes") {
    val vecs = planted()
    val df = vecs.toDF("vec_id", "embedding")
    val idx = IvfPq.build(df, "vec_id", "embedding", nCells = 8, m = 4, k = 16)
    val one = IvfPq.search(idx, vecs.head._2, kTop = 1000, nProbe = 1)
    val scanned = one.count()
    val cellSizes = idx.codes.groupBy("centroid_id").count()
      .collect().map(_.getLong(1)).toSet
    assert(cellSizes.contains(scanned),
      s"nProbe=1 returned $scanned rows; cell sizes are $cellSizes")
  }

  test("judged query q179 returns 10 rows with ADC tracking exact distance") {
    val res = Queries.all("q179_ivfpq")(spark, sf()).collect()
    assert(res.length == 10)
    // ADC approximates the same normalized cosine distance the exact
    // column reports: on the real (random) corpus allow loose error,
    // but they must be in the same regime (no unit mismatch).
    val maxGap = res.map(r => math.abs(r.getDouble(1) - r.getDouble(2))).max
    assert(maxGap < 1.0, s"ADC and exact distances diverge: $maxGap")
  }
}
