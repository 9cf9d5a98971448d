package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: embedding & model-adjacent ops — ANN (IVF/PQ), PCA, probes, rerankers, retrieval metrics, calibration.
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesMl { this: Queries.type =>

  /** E20: brute-force cosine top-k against the vec_id=0 query vector.
    * The probe vector broadcasts (single-row cross join); similarity is
    * pure codegen'd array math (`zip_with`+`aggregate`, no UDF); top-k
    * is TakeOrderedAndProject. At 100 TB this is the exact-scan
    * baseline; LSH/IVF variants land in later rounds.
    */
  def q08_cosine_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = tWide(s, dir, "embeddings")
    graft.operators.Dedup.cosineTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      probe = emb.filter(col("vec_id") === 0), k = 10)
      .withColumnRenamed("id", "vec_id")
  }

  /** North-star embedding near-dup, exact threshold join (the
    * verification baseline; quadratic COMPUTE by definition, but the
    * benched form is the triangle-BLOCKED equi-join — bounded cells a
    * cluster can schedule, no CartesianProduct in the plan. Vectors
    * are pre-normalized so the pair stage is one fused dot product.
    * The naive crossJoin form survives as the LlmOpsSpec differential
    * only.
    */
  def q25_embed_neardup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairsExactBlocked(tWide(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
      .orderBy("id_a", "id_b")

  /** North-star ANN, IVF scale path: 16-cell inverted file built by
    * the full k-means machinery (deterministic hash-sample seeds + 2
    * Lloyd rounds), searched at nProbe = nCentroids — the EXACT
    * configuration of the IVF dial (FAISS's nprobe=nlist), which makes
    * the output the true cosine top-k and therefore ORACLE-JUDGED
    * against the same SQL as q08 (normalize-then-dot arithmetic
    * mirrored on both sides). The judged surface is the whole
    * build+search pipeline: a centroid bug that mis-assigned vectors
    * or a search bug that dropped a cell breaks the hash. The PRUNED
    * dial (nProbe=4, ~1/4 of the corpus scanned, recall<1 by design)
    * stays judged by AnnIvfSpec's recall-vs-exact ground truth, and
    * its on-disk PartitionFilters form by q152/AnnIvfSpec.
    */
  def q34_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AnnIvf
    val emb = t(s, dir, "embeddings")
    // Normalize ONCE and share: the seed sample, both Lloyd rounds, and
    // the final assignment all read this cached frame (the compose-by-
    // name form re-ran the per-row sqrt+divide corpus scan 4×). Lazy
    // persist — released by Bench/Verify session hygiene.
    val normed = AnnIvf.normalized(emb, "vec_id", "embedding")
      .persistTracked()
    val cents = AnnIvf.centroidsNormed(normed, nCentroids = 16)
    val index = AnnIvf.assignNormed(normed.filter(col("id") =!= 0), cents)
    AnnIvf.search(index, cents,
      probe = emb.filter(col("vec_id") === 0), vecCol = "embedding",
      k = 10, nProbe = 16) // nProbe = nCentroids: the exact dial (oracle-judged)
  }

  /** Embedding aggregation: per-label centroid coordinates (first 4
    * dims) + mean squared norm. The per-vector fold (`transform` +
    * `aggregate`) is left-to-right in both engines, so per-row sums
    * are bit-identical; cross-row averages are order-free only under
    * rounding (4 dp).
    */
  def q64_label_centroids(s: SparkSession, dir: String): DataFrame = {
    val sq = aggregate(transform(col("embedding"), _.cast("double")),
      lit(0.0), (acc, x) => acc + x * x)
    t(s, dir, "embeddings")
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("c1"),
        round(avg(element_at(col("embedding"), 2).cast("double")), 4).as("c2"),
        round(avg(element_at(col("embedding"), 3).cast("double")), 4).as("c3"),
        round(avg(element_at(col("embedding"), 4).cast("double")), 4).as("c4"),
        round(avg(sq), 4).as("mean_sq_norm"))
      .orderBy("label")
  }

  /** Int8 scalar quantization of the embedding column (the bandwidth
    * lever for vector search at scale: 4 B float → 1 B code). Pass 1
    * computes per-dimension min/max over the posexploded coordinates;
    * the 64-row stats table broadcasts back over pass 2, which
    * quantizes q = round(255·(x−lo)/(hi−lo)) and measures the
    * round-trip reconstruction error per dimension. Both passes are
    * keyed hash aggregations — no global state beyond the broadcast.
    */
  def q105_scalar_quant(s: SparkSession, dir: String): DataFrame = {
    val ex = t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select((col("pos") + 1).as("dim"), col("xf").cast("double").as("x"))
    val stats = ex.groupBy("dim").agg(min("x").as("lo"), max("x").as("hi"))
    val deq = col("lo") + col("q") * (col("hi") - col("lo")) / lit(255)
    ex.join(broadcast(stats), "dim")
      .withColumn("q", round(lit(255) * (col("x") - col("lo")) / (col("hi") - col("lo"))))
      .withColumn("err", abs(col("x") - deq))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        round(min("lo"), 4).as("lo"),
        round(min("hi"), 4).as("hi"),
        round(avg("err"), 6).as("avg_abs_err"),
        round(max("err"), 6).as("max_abs_err"))
      .orderBy("dim")
  }

  /** kNN classification by cosine majority vote: probe vectors
    * (vec_id ≡ 0 mod 101) against the rest of the corpus. The probe
    * set is broadcast (it is the small side by construction), so the
    * base corpus streams through one narrow map — no shuffle of the
    * big side; ranking is per-probe (WindowGroupLimit prunes to k
    * rows per probe per partition). Similarities are rounded to 4
    * before ranking with vec_id tie-break, so the top-k frontier is
    * engine-stable; the vote picks (votes DESC, label ASC).
    */
  def q110_knn_classify(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id") % 101 === 0)
      .select(col("vec_id").as("qid"), col("label").as("true_label"), col("v").as("qv"))
    val base = e.filter(col("vec_id") % 101 =!= 0)
    val sims = base.crossJoin(broadcast(probes))
      .select(col("qid"), col("true_label"), col("vec_id"), col("label"),
        round(graft.operators.Dedup.cosine(col("v"), col("qv")), 4).as("sim"))
    val topk = sims
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rn") <= 5)
    topk.groupBy("qid", "true_label", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("qid").orderBy(col("votes").desc, col("label").asc)))
      .filter(col("vr") === 1)
      .select(
        col("qid").as("vec_id"), col("true_label"),
        col("label").as("pred_label"), col("votes"),
        (col("label") === col("true_label")).cast("int").as("correct"))
      .orderBy("vec_id")
  }

  /** Pairwise label-centroid cosine matrix — the cluster-separation
    * report after q64's centroid build (are label groups distinguishable
    * in embedding space?). Centroids come from ONE posexplode
    * partial+final agg over the corpus (|labels|·dims rows out); the
    * 45-pair upper triangle is a self-join of that tiny table — at
    * 100 TB the corpus pass dominates and the pair stage is free.
    */
  def q127_centroid_sim(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), (col("pos") + 1).as("i"))
      .agg(avg(col("col").cast("double")).as("v"))
    val n = c.groupBy("label").agg(sum(col("v") * col("v")).as("nn"))
    val a = c.select(col("label").as("label_a"), col("i"), col("v").as("va"))
    val b = c.select(col("label").as("label_b"), col("i"), col("v").as("vb"))
    a.join(b, Seq("i")).filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b").agg(sum(col("va") * col("vb")).as("dot"))
      .join(n.select(col("label").as("label_a"), col("nn").as("na")), "label_a")
      .join(n.select(col("label").as("label_b"), col("nn").as("nb")), "label_b")
      .select(col("label_a"), col("label_b"),
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 4).as("cos_sim"))
      .orderBy("label_a", "label_b")
  }

  /** The IVF index's ON-DISK pruned search path as a judged query (the
    * 100 TB read shape, previously spec-only): the inverted file is
    * PERSISTED partitioned by cell (`writeIndex` — one directory per
    * centroid), and the search prunes non-probed cells at the FILE
    * LISTING (PartitionFilters on `centroid_id`), so only
    * ~nProbe/nCentroids of the stored corpus is opened on the pruned
    * dial. Judged at the EXACT dial (nProbe = nCentroids, q34's
    * pattern): the output is the true cosine top-k THROUGH the
    * write-index → read-index → search round trip, hash-matched
    * against q08's SQL — a lost cell directory, a partition-column
    * type mangle, or a search bug breaks the hash. The pruned
    * nProbe=4 path (recall + PartitionFilters pruning assertions)
    * stays judged by AnnIvfSpec.
    */
  def q152_ann_ivf_disk(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AnnIvf
    val emb = t(s, dir, "embeddings")
    val normed = AnnIvf.normalized(emb, "vec_id", "embedding")
      .persistTracked()
    val cents = AnnIvf.centroidsNormed(normed, nCentroids = 16)
    val idxPath = scratch("graft_ivf_index")
    AnnIvf.writeIndex(AnnIvf.assignNormed(normed.filter(col("id") =!= 0), cents), idxPath)
    AnnIvf.search(AnnIvf.readIndex(s, idxPath), cents,
      probe = emb.filter(col("vec_id") === 0), vecCol = "embedding",
      k = 10, nProbe = 16) // exact dial; pruned nProbe=4 judged in AnnIvfSpec
  }

  /** Distributed covariance matrix over the embedding corpus — the
    * linear-algebra primitive under PCA / whitening / feature
    * decorrelation in a training pipeline. Upper triangle of the
    * d x d matrix (d=64 → 2080 rows) via E[xy] − E[x]E[y]: posexplode
    * to (vec_id, dim, x), self-join on vec_id with i <= j, then ONE
    * hash aggregation whose map-side combine collapses the 42M
    * product rows to d(d+1)/2 groups per partition before the
    * shuffle — the shuffle carries ~2080 rows per partition no matter
    * the corpus size, which is the whole 100 TB story. The join's
    * input is small but its fan-out is d^2 per vector, so both sides
    * are explicitly repartitioned (the q153 lesson: AQE's input-byte
    * coalescing would run the fan-out stage nearly single-threaded).
    * The DESIGNED join is that co-partitioned self-join on vec_id; at
    * the test SFs the exploded side fits the broadcast threshold and
    * AQE runs it as a BHJ instead (the small-corpus shortcut). At 10x
    * it reverts to the designed sort-merge join over the SAME
    * partitioning — ScaleRehearsal measures exactly this flip with
    * ZERO added exchanges (4 -> 4), which is why the query sits on
    * the rehearsal's documented-flip allowlist beside q106/q171.
    */
  def q159_embed_covariance(s: SparkSession, dir: String): DataFrame = {
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ex = tWide(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col("vec_id"), (col("p") + 1).as("i"), col("xf").cast("double").as("x"))
      .repartition(nPart, col("vec_id"))
    val b = ex.select(col("vec_id").as("vid2"), col("i").as("j"), col("x").as("y"))
    ex.join(b, col("vec_id") === col("vid2") && col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("x") * col("y")).as("sxy"),
        sum("x").as("sx"), sum("y").as("sy"))
      .select(col("i"), col("j"),
        // + 0.0 collapses IEEE negative zero (a tiny negative cov that
        // rounds to zero stringifies as "-0.0" vs the oracle's "0.0")
        (round(col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")), 4)
          + lit(0.0)).as("cov"))
      .orderBy("i", "j")
  }

  /** Hybrid retrieval via reciprocal-rank fusion — the standard fusion
    * of lexical (BM25, q82's scoring) and dense (cosine vs the
    * vec_id=0 probe, q08's scoring) rankings: rrf = Σ 1/(60+rank),
    * absent-from-a-list contributes 0 (full outer join). Ranks are
    * taken over ROUNDED scores with id tie-breaks (the cross-engine
    * determinism contract), and computed with the distributed
    * `PrefixSum.globalRank` — NOT a single-partition window — so the
    * ranking step holds at corpus scale; cosine sims are normalized
    * `+ 0.0` so a negative sim that rounds to zero cannot order
    * differently than the oracle (Spark's Double.compare puts -0.0
    * before 0.0; SQL engines treat them equal).
    */
  def q160_hybrid_rrf(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val bm = q82_bm25(s, dir)
      .select(col("doc_id"), (-col("bm25")).as("neg_s"))
    val bmRank = PrefixSum.globalRank(bm, Seq("neg_s", "doc_id"), "r_bm")
      .select(col("doc_id").as("b_id"), col("r_bm"))
    val emb = tWide(s, dir, "embeddings")
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val e = col("embedding").cast("array<double>")
    val qv = col("qv").cast("array<double>")
    // The query-vector norm is hoisted onto the 1-row broadcast side
    // (r13): sqrt(dot(qv,qv)) is constant but sat inside the per-row
    // projection, re-running 64 multiply-adds per corpus vector. Same
    // double (same dot, same sqrt), so the product and the round are
    // bit-identical.
    val cos = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
        .select(col("qv"), sqrt(dot(qv, qv)).as("qn"))))
      .select(col("vec_id"),
        (round(dot(e, qv) / (sqrt(dot(e, e)) * col("qn")), 4) + lit(0.0))
          .as("sim"))
      .select(col("vec_id"), (-col("sim")).as("neg_s"))
    val cosRank = PrefixSum.globalRank(cos, Seq("neg_s", "vec_id"), "r_cos")
      .select(col("vec_id").as("c_id"), col("r_cos"))
    bmRank.join(cosRank, col("b_id") === col("c_id"), "full")
      .select(
        coalesce(col("b_id"), col("c_id")).as("doc_id"),
        round(coalesce(lit(1.0) / (lit(60) + col("r_bm")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0)), 6).as("rrf"),
        coalesce(col("r_bm"), lit(-1L)).as("r_bm"),
        coalesce(col("r_cos"), lit(-1L)).as("r_cos"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(20)
  }

  /** Top-principal-component histogram (operators/Pca): distributed
    * covariance (q159's map-side-combined shape) → driver power
    * iteration on the 64x64 matrix → distributed projection, scores
    * cut into 10 equal-width bins. Rows-only: the eigenvector is not
    * SQL-expressible; the direction-recovery ground truth (planted
    * dominant axis) lives in Round5OpsSpec.
    */
  def q168_pca_power(s: SparkSession, dir: String): DataFrame =
    operators.Pca.projectionHistogram(
      tWide(s, dir, "embeddings"), "vec_id", "embedding",
      dim = 64, nBins = 10)

  /** Product-quantized ANN (operators/Pq): codebooks trained on a
    * hash-deterministic sample, the corpus encoded to m=8 byte-codes
    * per vector (64 float32 → 8 small ints ⇒ 32× compression), then
    * for three probes an ADC top-10 scan that reads ONLY the code
    * column — followed by the standard exact re-rank of the 10
    * survivors. m=8 (8-dim subspaces) rather than 4: the driver
    * embeddings are i.i.d.-random (PQ's worst case), and halving the
    * subspace dim roughly doubles measured top-50 containment of the
    * exact top-10. Rows-only: driver-side Lloyd + a codegen lookup
    * table have no SQL equivalent; recall-vs-exact (planted clusters),
    * the ADC/exact correlation on this corpus, and the argmin⟺argmax
    * augmentation identity are pinned in PqSpec.
    */
  def q176_pq_adc(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    val emb = t(s, dir, "embeddings")
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, sampleN = 2048, rounds = 5)
    // Consumed once per probe — persist so the 3 ADC scans re-read
    // codes, not the float corpus. Released by session hygiene.
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
      .persistTracked()
    val probeIds = Seq(0L, 1L, 2L)
    val pvs = emb.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = emb.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    probeIds.map { p =>
      val q = pvs(p)
      val qq = q.map(x => x * x).sum
      val topk = Pq.searchTopK(codes.filter(col("id") =!= p), cb, q, 10)
      raw.join(broadcast(topk), "id")
        .select(lit(p).as("probe_id"), col("id").as("vec_id"),
          round(col("adc_dist"), 4).as("adc_dist"),
          round(graft.expr.VectorExpressions.dot(col("v"), col("v"))
            - lit(2.0) * graft.expr.VectorExpressions.dot(col("v"),
                lit(q).cast("array<double>"))
            + lit(qq), 4).as("exact_dist"))
    }.reduce(_ unionByName _)
      .orderBy("probe_id", "adc_dist", "vec_id")
  }

  /** MMR diversity re-rank (operators/Mmr): cosine top-50 retrieval
    * (distributed, TakeOrderedAndProject) → greedy λ=0.7 maximal-
    * marginal-relevance selection of 10 on the driver (bounded 50×64).
    * Rows-only: the greedy argmax is inherently sequential; the
    * diversity property (MMR's picks are less mutually similar than
    * the plain top-10) is pinned in MmrSpec.
    */
  def q177_mmr_rerank(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{AnnIvf, Mmr}
    val normed = AnnIvf.normalized(t(s, dir, "embeddings"), "vec_id", "embedding")
    val probe = normed.filter(col("id") === 0)
      .select("nv").collect()(0).getSeq[Double](0).toArray
    Mmr.rerank(s, normed.filter(col("id") =!= 0), probe,
        k = 10, nCandidates = 50, lambda = 0.7)
      .orderBy("rank")
  }

  /** IVF-PQ composite index (operators/IvfPq — the FAISS IVFADC
    * architecture): inverted-file coarse cells + product quantization
    * of the RESIDUALS, searched via nProbe per-cell ADC scans that
    * never touch float vectors. The billion-vector configuration:
    * cell pruning cuts the scan to nProbe/nCells of the corpus AND
    * each scanned row is m bytes, not d floats. Output is the ADC
    * top-10 for probe vec 0 with exact re-ranked distances (q176's
    * shape). Rows-only; recall and the residual-beats-raw property
    * are pinned in IvfPqSpec.
    */
  def q179_ivfpq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfPq
    val emb = t(s, dir, "embeddings")
    val idx = IvfPq.build(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      nCells = 16, m = 8, k = 16)
    val q = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect()(0).getSeq[Double](0).toArray
    val topk = IvfPq.search(idx, q, kTop = 10, nProbe = 4)
    // Exact re-rank of the survivors in the same normalized space the
    // index measures (cosine distance = 2 − 2·dot of unit vectors).
    val qn = { val n = math.sqrt(q.map(x => x * x).sum); q.map(_ / n) }
    graft.operators.AnnIvf.normalized(emb, "vec_id", "embedding")
      .join(broadcast(topk), "id")
      .select(col("id").as("vec_id"), round(col("adc_dist"), 4).as("adc_dist"),
        round(lit(2.0) - lit(2.0) * graft.expr.VectorExpressions.dot(col("nv"),
          lit(qn).cast("array<double>")), 4).as("exact_dist"))
      .orderBy("adc_dist", "vec_id")
  }

  /** Logistic linear probe (operators/LinearProbe): train a binary
    * quality-classifier-style probe (label==0 vs rest) on the
    * embedding column by full-batch distributed gradient descent —
    * driver holds d+1 weights, each step is ONE scan + a d-row
    * shuffle. Output: 1-row training summary (final loss, accuracy,
    * weight norm). Rows-only: iterative GD has no SQL form; loss
    * decrease + separable-data accuracy are pinned in LinearProbeSpec.
    */
  def q182_linear_probe(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.LinearProbe
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), (col("label") === 0).cast("int").as("y"))
    val fit = LinearProbe.train(emb, "embedding", "y", iters = 12, lr = 0.5)
    LinearProbe.predict(emb, "embedding", fit)
      .agg(count(lit(1)).as("n"),
        round(avg((col("yhat") === col("y")).cast("double")), 4).as("train_acc"),
        round(lit(fit.lossPerIter.last), 4).as("final_loss"),
        round(lit(math.sqrt(fit.weights.map(x => x * x).sum)), 4).as("w_norm"))
  }

  /** Exact ROC-AUC via the Mann-Whitney rank statistic, computed
    * DISTRIBUTED: scores are ranked with PrefixSum.globalRank (two-
    * pass, no single-partition window), then
    * AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻). Scores = dot(embedding,
    * probe vec 0) in double precision — bit-identical sequential sums
    * in both engines, so ranks (ties broken by id; scores continuous)
    * and the AUC match the oracle exactly. The in-engine eval metric
    * every retrieval/classifier pipeline needs.
    */

  def q183_auc(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    PrefixSum.globalRank(probeScored(s, dir), Seq("score", "vec_id"), "rnk")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        round((sum(when(col("y") === 1, col("rnk"))) -
          sum("y") * (sum("y") + 1) / lit(2.0)) /
          (sum("y") * (count(lit(1)) - sum("y"))), 4).as("auc"))
  }

  /** Calibration bins for a scorer (q183's companion eval metric):
    * cosine-to-probe scores split into 10 equal-width bins over the
    * observed [min,max] (1-row broadcast, q81's envelope pattern),
    * per-bin count / mean score / positive fraction — the reliability-
    * diagram table. Scores are double-precision dots (bit-identical
    * across engines, q183's guarantee), so bin edges and memberships
    * match the oracle exactly.
    */
  def q184_calibration_bins(s: SparkSession, dir: String): DataFrame = {
    val scored = probeScored(s, dir)
    val env = scored.agg(min("score").as("lo"), max("score").as("hi")) // 1-row broadcast
    scored.crossJoin(broadcast(env))
      .withColumn("bin",
        least(floor((col("score") - col("lo")) / (col("hi") - col("lo")) * 10), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg("score"), 4).as("mean_score"),
        round(avg(col("y").cast("double")), 4).as("frac_pos"))
      .orderBy("bin")
  }

  /** Retrieval-eval metrics in one pass — nDCG@10, MRR, recall@10 —
    * for the cosine-to-probe ranking with same-label relevance
    * (q183's companion; together they are the eval harness a
    * retrieval pipeline runs in-engine instead of exporting to
    * python). Ranks come from PrefixSum.globalRank on (−score, id)
    * (distributed two-pass); every metric is then conditional
    * aggregation over ONE ranked frame, and IDCG is a closed-form
    * HOF sum over min(10, n_pos) on the 1-row result.
    */
  def q189_retrieval_metrics(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val scored = probeScored(s, dir).withColumn("negs", -col("score"))
    PrefixSum.globalRank(scored, Seq("negs", "vec_id"), "rnk")
      .agg(
        sum("y").as("n_pos"),
        sum(when(col("rnk") <= 10, col("y"))).as("hits10"),
        sum(when(col("rnk") <= 10,
          col("y") / log(2.0, col("rnk") + 1))).as("dcg"),
        max(when(col("y") === 1, lit(1.0) / col("rnk"))).as("mrr"))
      .select(col("n_pos"), col("hits10"),
        round(col("hits10").cast("double") / col("n_pos"), 4).as("recall10"),
        round(col("mrr"), 4).as("mrr"),
        round(col("dcg") / aggregate(
          sequence(lit(1L), least(lit(10L), col("n_pos"))),
          lit(0.0), (acc, i) => acc + lit(1.0) / log(2.0, i.cast("double") + 1)), 4)
          .as("ndcg10"))
  }

  /** Johnson-Lindenstrauss random projection: 64-dim embeddings down
    * to 4 dims through a ±1 sign matrix derived from md5 parity —
    * hash-derived, so the "random" matrix needs no storage, no
    * broadcast, and both engines rebuild it bit-identically (the JL
    * guarantee only needs sign randomness, Achlioptas 2001). The
    * projection is a zip_with + left-fold `aggregate` per output dim —
    * a narrow codegen map, k·d multiply-adds per row, NO shuffle: at
    * 100 TB this is the cheap pre-pass that shrinks vectors 16× before
    * ANN indexing or clustering ever shuffles them. Fold order is the
    * array order in both engines, so the double sums match exactly
    * (q183's dot-product precedent).
    */
  def q204_jl_projection(s: SparkSession, dir: String): DataFrame = {
    def proj(j: Int): Column = round(
      aggregate(
        zip_with(col("embedding"), sequence(lit(0), lit(63)),
          (x, i) => when(
            substring(md5(concat_ws("_", lit(j.toString), i.cast("string"))), 1, 1)
              .isin("0", "1", "2", "3", "4", "5", "6", "7"),
            x.cast("double")).otherwise(-x.cast("double"))),
        lit(0.0), (acc, v) => acc + v), 4)
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 15)
      .select(col("vec_id"), proj(0).as("p0"), proj(1).as("p1"),
        proj(2).as("p2"), proj(3).as("p3"))
      .orderBy("vec_id")
  }

  /** Embedding-table contract audit — q232's genre applied to the
    * vector column, where the failure modes are numeric, not
    * relational: NaN/Inf cells, zero vectors (cosine-undefined),
    * dimension drift (ragged arrays), duplicate ids, and the norm
    * envelope (a silently unnormalized batch shifts it). One pass;
    * the per-cell predicates are codegen'd HOF `exists`/`aggregate`
    * folds, never a posexplode shuffle. The gate an embedding publish
    * runs before ANN indexes build on garbage.
    */
  def q241_embedding_contract(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val x = col("embedding")
    val norm2 = aggregate(x, lit(0.0d), (a, v) => a + v.cast("double") * v.cast("double"))
    // the norm envelope is over HEALTHY vectors only — a NaN cell would
    // otherwise poison max() (NaN sorts above every double) and report
    // the corruption twice
    val healthy = x.isNotNull && !exists(x, v => v.cast("double").isNaN ||
      abs(v.cast("double")) === lit(Double.PositiveInfinity))
    e.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count_distinct(col("vec_id"))).as("dup_ids"),
        sum(when(x.isNull, 1L).otherwise(0L)).as("null_vectors"),
        sum(when(exists(x, v => v.cast("double").isNaN ||
          abs(v.cast("double")) === lit(Double.PositiveInfinity)), 1L).otherwise(0L))
          .as("nonfinite_vectors"),
        count_distinct(size(x)).as("n_dims_seen"),
        sum(when(norm2 === 0.0, 1L).otherwise(0L)).as("zero_vectors"),
        round(min(when(healthy, sqrt(norm2))), 4).as("min_norm"),
        round(max(when(healthy, sqrt(norm2))), 4).as("max_norm"))
  }

  /** Feature-store materialization: the per-user churn-model feature
    * row — activity counts over trailing 7/14/28-day windows from the
    * corpus frontier, recency, distinct event types, spend — built in
    * ONE conditional aggregate over one fact shuffle (the multi-window
    * trailing counts are predicates, not three scans). Sampled to
    * user_id % 10 = 0 for a bounded judged result; integer-exact
    * everything.
    */
  def q242_feature_matrix(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val frontier = ev.agg(max(to_date(col("ts"))).as("now"))
    ev.crossJoin(broadcast(frontier))
      .withColumn("age_d", datediff(col("now"), to_date(col("ts"))))
      .groupBy("user_id")
      .agg(
        sum(when(col("age_d") < 7, 1L).otherwise(0L)).as("events_7d"),
        sum(when(col("age_d") < 14, 1L).otherwise(0L)).as("events_14d"),
        sum(when(col("age_d") < 28, 1L).otherwise(0L)).as("events_28d"),
        min("age_d").cast("long").as("recency_d"),
        count_distinct(col("event_type")).as("n_event_types"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("spend_cents"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
      .filter(col("user_id") % 10 === 0)
      .orderBy("user_id")
  }

  /** Leave-one-out target encoding: each part's brand encoded as the
    * mean retail price of the OTHER parts of that brand — the
    * leakage-controlled categorical encoding (plain mean encoding
    * leaks each row's own target; LOO (Σ−x)/(n−1) is the standard
    * fix). One brand-grain aggregate broadcast back onto the rows;
    * all arithmetic in exact integer cents until one final division
    * per row. Singleton brands (n=1) have no LOO value → NULL, the
    * honest answer (imputing the global mean is the caller's policy).
    */
  def q249_target_encoding(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100, 0).cast("long").as("cents"))
    val g = p.groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    p.join(broadcast(g), "p_brand")
      .withColumn("loo_mean", when(col("n") > 1,
        round((col("s") - col("cents")) / ((col("n") - 1) * lit(100.0)), 4)))
      .filter(col("p_partkey") <= 40)
      .select("p_partkey", "p_brand", "n", "loo_mean")
      .orderBy("p_partkey")
  }

  /** Mann-Whitney U rank-sum test: do weekend purchases draw from a
    * different value DISTRIBUTION than weekday ones — the
    * nonparametric complement to q259's mean-based ANOVA (no
    * normality assumption; sensitive to shift anywhere in the
    * distribution, not just the mean). The pooled ranking needs a
    * GLOBAL cumulative count over the distinct-value frame — q206's
    * cost-based PrefixSum scan, never a mandatory single-partition
    * window over raw rows — and ties take the textbook average rank,
    * kept EXACT by working in doubled ranks (2·avgrank =
    * 2·cum − cnt + 1, an integer): the rank sum, U, and the tie
    * correction Σ(t³−t) are exact 64-bit integers on both engines;
    * the only floating point is the final normal-approximation z,
    * rounded once.
    */
  def q261_mann_whitney(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val g = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      // Spark dayofweek: 1=Sunday..7=Saturday (oracle uses DuckDB's
      // 0=Sunday..6=Saturday — both select Sat+Sun)
      .withColumn("wk", dayofweek(col("ts")).isin(1, 7))
      .groupBy("value")
      .agg(sum(when(col("wk"), 0L).otherwise(1L)).as("na_v"),
        sum(when(col("wk"), 1L).otherwise(0L)).as("nb_v"))
      .withColumn("cnt", col("na_v") + col("nb_v"))
    val c = PrefixSum.runningTotal(g, "value", "cnt", "cum")
    // observations tied at this value hold ranks cum−cnt+1..cum; their
    // average rank doubled is the INTEGER 2·cum − cnt + 1
    val r2 = col("cum") * 2 - col("cnt") + 1
    val a = c.agg(
      sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
      sum(col("na_v") * r2).as("r2a"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"))
    val n = col("n_a") + col("n_b")
    val u2 = col("r2a") - col("n_a") * (col("n_a") + 1) // 2·U_a, exact
    a.select(
      col("n_a"), col("n_b"),
      (u2 / 2.0).as("u_a"),
      round((u2 / 2.0 - col("n_a") * col("n_b") / 2.0) /
        sqrt(col("n_a") * col("n_b") / 12.0 *
          ((n + 1) - col("tie3") / (n * (n - lit(1.0))))), 4).as("z"))
  }

  /** 2-D Pareto skyline of orders — cheapest-for-freshest: an order
    * survives iff NO other order is both ≤ its price and ≥ its date
    * (one strictly) — the classic skyline operator, O(n²) as written
    * in SQL but O(n log n) as a strict prefix-maximum scan: group to
    * the distinct-price frame, take max(date) per price, and keep the
    * prices whose max-date strictly exceeds the running max over all
    * cheaper prices. The scan is [[PrefixSum.runningMaxExclusive]] —
    * cost-based two-pass distributed prefix max, the same shape as
    * q93's ranks — and the survivors join back by (price, date)
    * equality, a broadcast-able equi-join. Dates compare as exact
    * unix_micros longs; ties on both dimensions all survive
    * (dominance requires one strict inequality).
    */
  def q264_skyline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    // cast("timestamp") first: the testdata files carry TIMESTAMP_NTZ,
    // which unix_micros rejects; the cast is monotone and injective, so
    // ordering and equality — all the skyline uses — are unchanged
    val micros = (c: Column) => unix_micros(c.cast("timestamp"))
    val g = o.groupBy("o_totalprice")
      .agg(max(micros(col("o_orderdate"))).as("maxd"))
    val sky = PrefixSum.runningMaxExclusive(g, "o_totalprice", "maxd", "prevmax")
      .filter(col("maxd") > col("prevmax"))
      .select(col("o_totalprice").as("sk_price"), col("maxd"))
    o.join(sky, o("o_totalprice") === col("sk_price") &&
        micros(o("o_orderdate")) === col("maxd"))
      .select(o("o_orderkey"), o("o_totalprice"), o("o_orderdate"))
      .orderBy("o_totalprice", "o_orderkey")
  }

  /** Hard-negative mining for retrieval training: for each of the
    * first 5 probe vectors, the top-1 corpus neighbor (the positive)
    * plus ranks 11-13 (hard negatives — close enough to be
    * informative, far enough to be wrong; the band every contrastive
    * training recipe samples from). Probes broadcast over the corpus
    * (q110's pattern — the corpus side never shuffles); cosine is the
    * fused codegen dot product rounded to 4 dp BEFORE ranking with a
    * vec_id tie-break, q08's determinism rule, so the rank order is
    * engine-identical. The rank ≤ 13 filter lets Spark's
    * WindowGroupLimit keep per-partition top-k heaps instead of fully
    * sorting each probe's scores.
    */
  def q268_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    val emb = tWide(s, dir, "embeddings")
    val asD = (c: Column) => transform(c, x => x.cast("double"))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), asD(col("embedding")).as("qv"))
    val scored = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id"), asD(col("embedding")).as("v"))
      .crossJoin(broadcast(probes))
      .select(col("qid"), col("vec_id"),
        round(graft.operators.Dedup.cosine(col("v"), col("qv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") === 1 || (col("rnk") >= 11 && col("rnk") <= 13))
      .select(col("qid"), col("rnk"),
        when(col("rnk") === 1, "positive").otherwise("hard_negative").as("role"),
        col("vec_id"), col("sim"))
      .orderBy("qid", "rnk")
  }

  /** Mann-Kendall trend test on daily revenue — the significance
    * companion to q254's Theil-Sen slope (Theil-Sen says HOW steep,
    * MK says WHETHER the monotone trend is distinguishable from
    * noise; together they're the standard nonparametric trend kit).
    * S = Σ sign(rev_j − rev_i) over ordered day pairs — the C(days,2)
    * pair frame is calendar-bounded, q254's pattern — and the
    * tie-corrected variance 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5)
    * stays in exact integers; daily revenue is rounded once so sign
    * and tie classes are engine-identical. z applies the standard
    * ±1 continuity correction, NULL when the variance degenerates.
    */
  def q273_mann_kendall(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val a = daily.select(col("day").as("da"), col("rev").as("ra"))
    val b = daily.select(col("day").as("db"), col("rev").as("rb"))
    val sS = a.join(b, col("da") < col("db"))
      .agg(sum(signum(col("rb") - col("ra")).cast("long")).as("s_stat"))
    val ties = daily.groupBy("rev").agg(count(lit(1)).as("tg"))
      .agg(sum(col("tg") * (col("tg") - 1) * (col("tg") * 2 + 5)).as("tie18"),
        sum(col("tg")).as("n"))
    val var18 = col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie18")
    sS.crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), col("s_stat"),
        when(var18 > 0, round(
          when(col("s_stat") > 0, (col("s_stat") - 1) / sqrt(var18 / 18.0))
            .when(col("s_stat") < 0, (col("s_stat") + 1) / sqrt(var18 / 18.0))
            .otherwise(lit(0.0)), 4)).as("z"))
  }

  /** Isotonic calibration of q184's reliability bins — the monotone
    * fit every production calibrator (Zadrozny-Elkan isotonic
    * regression) lays over the raw bin rates before serving
    * probabilities. Solved by the minimax characterization of PAVA:
    * ŷ_i = max_{j≤i} min_{k≥i} wavg(y over bins j..k) — three
    * bounded self-joins of the ≤10-row bin frame (≤10³ combinations),
    * never an iterative pool loop, and every interval average is one
    * division of exact integer sums so both engines agree bit-for-bit.
    * The corpus is touched once (the binning aggregate); everything
    * monotone happens on the bounded frame — the 100 TB shape.
    */
  def q316_isotonic_calibration(s: SparkSession, dir: String): DataFrame = {
    val scored = probeScored(s, dir)
    val env = scored.agg(min("score").as("lo"), max("score").as("hi"))
    val bins = scored.crossJoin(broadcast(env))
      .withColumn("bin",
        least(floor((col("score") - col("lo")) / (col("hi") - col("lo")) * 10), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"),
        round(avg("score"), 4).as("mean_score"),
        round(avg(col("y").cast("double")), 4).as("frac_pos"))
      .persistTracked() // ≤10 rows, consumed by three bounded joins
    val fit = operators.Isotonic.fit(bins, "bin", "n", "sy")
      .withColumnRenamed("bin", "i")
    bins.join(fit, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("mean_score"), col("frac_pos"),
        round(col("iso"), 6).as("iso_fit"))
      .orderBy("bin")
  }

  /** MMR judged at the k = 2 EXACT dial: the first greedy pick is the
    * relevance argmax (redundancy 0), the second maximizes
    * λ·rel − (1−λ)·cos(·, pick₁) over the remaining candidates — both
    * closed-form single argmaxes over per-row double arithmetic, so
    * the dial is fully SQL-expressible and judges Mmr.rerank's whole
    * algebra: candidate retrieval (top-50 by (rel desc, id)), the
    * λ-blend, the redundancy term, tie-breaks, and the
    * rint-half-even/1e4 output rounding (round_even in DuckDB). The
    * k = 10 production dial (q177) stays rows-only: picks ≥ 3 need
    * max-over-selected-set state only the greedy loop carries.
    * Float safety is the q183 precedent — every number here is a
    * per-row SEQUENTIAL double dot (bit-identical in both engines),
    * never a cross-row float aggregate; measured decision margins
    * (argmax gap ≥ 4.4e-3, candidate-cut gap ≥ 8.2e-4, half-boundary
    * distance ≥ 1.8e-4 at every SF) sit ≥ 11 orders above 1e-15
    * association noise anyway.
    */
  def q361_mmr_exact(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{AnnIvf, Mmr}
    val normed = AnnIvf.normalized(t(s, dir, "embeddings"), "vec_id", "embedding")
    val probe = normed.filter(col("id") === 0)
      .select("nv").collect()(0).getSeq[Double](0).toArray
    Mmr.rerank(s, normed.filter(col("id") =!= 0), probe,
        k = 2, nCandidates = 50, lambda = 0.7)
      .orderBy("rank")
  }

  /** PCA judged at the ONE-POWER-STEP exact dial (q362 — the
    * q357/q359/q360/q361 pattern, applied to q168): a single power
    * iteration from the fixed all-ones start is one matvec
    * v₁ = C·v₀ / ‖C·v₀‖ — and since v₀ is constant, v₁ is just the
    * covariance ROW SUMS normalized, fully SQL-expressible via q159's
    * already-oracle-matched d(d+1)/2 co-moment machinery. This judges
    * every stage of operators/Pca EXCEPT iteration ≥ 2: covariance
    * (distributed, map-side-combined), the matvec + normalize + sign
    * fix (first |component| > 1e-12 positive), the distributed
    * projection dot, and the clamped equal-width histogram. The
    * 50-iteration production dial (q168) stays rows-only: repeated
    * normalize steps have no SQL form. Float safety, measured at all
    * three SFs (SWEEP.md pattern 4): bin-edge margin ≥ 4.2e-5 of a
    * bin width and sign-component margins ≥ 3.4e-3 vs the ~1e-13
    * cross-engine perturbation of the covariance sums — and the
    * extreme rows (pc1 == lo/hi, where a one-ULP re-execution flip
    * IS possible) are pinned by the operator's two-sided bin clamp.
    */
  def q362_pca_first_step(s: SparkSession, dir: String): DataFrame =
    operators.Pca.projectionHistogram(
      tWide(s, dir, "embeddings"), "vec_id", "embedding",
      dim = 64, nBins = 10, powerIters = 1)

  /** Logistic linear probe judged at the ONE-GD-STEP exact dial (q363,
    * twin of q182): at w₀ = 0 every σ(w·x) is exactly 0.5, so the
    * first full-batch gradient is the closed-form per-feature
    * aggregate g_j = avg((0.5 − y)·x_j) and the first step's weights
    * w₁ = −lr·g are SQL-expressible end-to-end. The judged frame runs
    * the REAL operator (LinearProbe.train, iters = 1) and emits the
    * 65 per-dimension weights (64 features + bias) PLUS the post-step
    * metrics the production probe reports — accuracy at the 0.5
    * decision threshold and mean log-loss under w₁ — which pins the
    * whole predict/sigmoid/log-loss algebra too; only iteration ≥ 2
    * (gradients at non-constant σ) stays rows-only in q182. Float
    * margins, measured at all 3 SFs: decision scores min |w₁·x| ≥
    * 0.19 (no accuracy flip possible), weight-rounding boundary
    * distance ≥ 2.2e-9 and loss-rounding ≥ 0.29 of a 1e-4 step vs
    * ~1e-17 association noise.
    */
  def q363_probe_first_step(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.LinearProbe
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), (col("label") === 0).cast("int").as("y"))
    val fit = LinearProbe.train(emb, "embedding", "y", iters = 1, lr = 0.5)
    val scored = LinearProbe.predict(emb, "embedding", fit)
    val summary = scored.agg(
      count(lit(1)).as("n"),
      round(avg((col("yhat") === col("y")).cast("double")), 4).as("acc1"),
      round(avg(-(col("y") * log(greatest(col("p"), lit(1e-12))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-12))))), 4)
        .as("loss1"))
    import s.implicits._
    val wdf = fit.weights.zipWithIndex
      .map { case (w, i) => (i.toLong, BigDecimal(w).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0) }
      .toSeq.toDF("pos", "w1")
    wdf.crossJoin(broadcast(summary)) // 1-row metric frame (q145's pattern)
      .orderBy("pos")
  }

  /** Product quantization judged at the MEAN-CODEBOOK exact dial
    * (q366, twin of q176 — the q362/q363/q364 pattern applied to the
    * last twinnable rows-only family): with k = 1 cell per subspace
    * and the training sample = the WHOLE corpus (sampleN ≥ n,
    * fail-loud guarded), Lloyd's update degenerates to the per-
    * subspace MEAN, so the codebook, the encode (all codes 0), the
    * probe's ADC distance table, and the AdcLookup scan sum are ALL
    * closed-form and DuckDB-judged: the 64 codebook values pin the
    * subspace split + centroid update, and the search summary pins
    * the ADC algebra — every row's distance is Σⱼ‖qⱼ−meanⱼ‖², so
    * adc_min == adc_max (a lookup that read the wrong table cell
    * breaks the equality) and top-1 is the id tie-break. The
    * production dial (q176: m=8, k=16, 5 Lloyd rounds on a hash-
    * deterministic sample) stays rows-only — multi-centroid Lloyd has
    * no SQL form. Float margins at all 3 SFs: centroid-rounding
    * boundary ≥ 1.3e-8 abs, ADC ≥ 0.085 of a 1e-4 step, vs ~1e-15
    * association noise. With this, 9 of the 10 rows-only operators
    * carry oracle-judged exact-dial twins; the 10th (q172,
    * engine-internal DEFLATE) is twinned by q368's judged contract
    * flags — every rows-only operator now has an oracle-checked
    * component.
    */
  def q366_pq_mean_dial(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    val emb = t(s, dir, "embeddings")
    val n = emb.count() // bounded table; the dial's contract check
    require(n <= 4096,
      s"q366 exact dial needs sampleN(4096) >= corpus rows ($n): at that " +
        "point the sample is no longer the whole corpus and the oracle breaks")
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 1,
      sampleN = 4096, rounds = 1)
    val probe = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect()(0).getSeq[Double](0).toArray
    val top = Pq.searchTopK(
      Pq.encode(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", cb),
      cb, probe, k = 3)
    val summary = top.agg(count(lit(1)).as("n_top"), min("id").as("top1_id"),
      (round(min("adc_dist"), 4) + 0.0).as("adc_min"),
      (round(max("adc_dist"), 4) + 0.0).as("adc_max"))
    import s.implicits._
    val cells = (for (j <- 0 until cb.m; i <- 0 until cb.subDim) yield
      (j.toLong, i.toLong, BigDecimal(cb.cells(j)(0)(i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
      .toDF("subspace", "dim", "centroid")
    cells.crossJoin(broadcast(summary)) // 1-row frame (q145's pattern)
      .orderBy("subspace", "dim")
  }

  /** Residual IVF-PQ judged at the 1-CELL / MEAN-CODEBOOK exact dial
    * (q367, twin of q179 — completing the twin set: every rows-only
    * operator except engine-internal DEFLATE now has an oracle-judged
    * dial): with one coarse cell, AnnIvf's Lloyd converges to the
    * NORMALIZED MEAN of the unit vectors; the PQ codebook over
    * residuals (k = 1, sample = whole corpus, fail-loud guarded)
    * degenerates to the MEAN RESIDUAL μ − c ≠ 0; and the probe's ADC
    * distance is Σ‖(qₙ−c)ⱼ − (μ−c)ⱼ‖² — identical for every row, so
    * adc_min == adc_max pins the per-cell table + lookup, and the
    * top-10 is pure id tie-break (ids 1..10). The judged rows are the
    * 64 coarse-centroid values AND the 64 residual-codebook values —
    * together they pin normalize→mean→normalize, the residual
    * subtraction (the IVFADC trick), the residual-space PQ train, and
    * the probed-cell ADC search; only multi-cell Lloyd (q179's
    * production dial: 16 cells, m=8, k=16) stays rows-only. Float
    * margins at 3 SFs: value-rounding ≥ 1.5e-9 abs, ADC ≥ 0.13 of a
    * 1e-4 step.
    */
  def q367_ivfpq_mean_dial(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfPq
    val emb = t(s, dir, "embeddings")
    val n = emb.count() // bounded table; the dial's contract check
    require(n <= 2048,
      s"q367 exact dial needs Pq.train's sample (2048) >= corpus rows ($n)")
    val idx = IvfPq.build(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      nCells = 1, m = 4, k = 1)
    val q = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect()(0).getSeq[Double](0).toArray
    val top = IvfPq.search(idx, q, kTop = 10, nProbe = 1)
    val summary = top.agg(count(lit(1)).as("n_top"),
      min("id").as("top1_id"), max("id").as("top10_id"),
      (round(min("adc_dist"), 4) + 0.0).as("adc_min"),
      (round(max("adc_dist"), 4) + 0.0).as("adc_max"))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val coarse = idx.cents.head._2
    val pqRes = (0 until idx.cb.m).flatMap(j => idx.cb.cells(j)(0))
    import s.implicits._
    val rows =
      (coarse.toSeq.zipWithIndex.map { case (v, d) => ("coarse", d.toLong, r6(v)) } ++
        pqRes.zipWithIndex.map { case (v, d) => ("pq_res", d.toLong, r6(v)) })
        .toDF("kind", "dim", "value")
    rows.crossJoin(broadcast(summary)) // 1-row frame (q145's pattern)
      .orderBy("kind", "dim")
  }

  /** The Spark-4 VARIANT surface as a judged query (the binary
    * semi-structured type the ingest pipeline itself parses into —
    * Validation's S5 path; q18/q52 judge the classic JSON-string
    * functions, this judges the typed-variant door): `parse_json` →
    * `variant_get(v, path, type)` for the typed hit,
    * `try_variant_get` for the missing-path null (counted per group to
    * pin the null-safe contract). VARIANT decode is a per-row codegen
    * op with no shuffle of its own; the rollup is one bounded
    * event-type aggregate. Oracle reproduces the extraction with
    * DuckDB's json_extract + cast.
    */
  def q339_variant_ops(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        try_variant_get(col("v"), "$.zz", "bigint").as("zz"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        count(col("zz")).as("n_zz"))
      .orderBy("event_type")
  }

  /** ENGINE-NATIVE runtime bloom-filter join injection (Catalyst's
    * InjectRuntimeFilter — the planner-side answer to q169's manual
    * BloomJoin, the row-level sibling of q314's partition-level DPP):
    * with a selective predicate on the small creation side of a
    * shuffle join, the optimizer plants a bloom_filter_agg subquery on
    * that side and a BloomFilterMightContain probe BELOW the fact
    * scan's shuffle, so most non-matching fact rows exit before the
    * exchange. Threshold confs are lowered to make the 10 GB-scale
    * rule fire at test SF (conf-wrapped and restored, q324's pattern);
    * the plan really carrying the probe is pinned in Round11OpsSpec.
    * The ≤3-row flag aggregate is collected INSIDE the wrap so the
    * judged run executes the bloom plan (bounded collect — the
    * advisor-query pattern), then rehydrated as the result frame.
    * Bloom injection is semantics-preserving, which the plain-join
    * DuckDB oracle proves.
    */

  private[graft] def mlAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q08_cosine_topk"   -> (q08_cosine_topk _),
    "q25_embed_neardup" -> (q25_embed_neardup _),
    "q34_ann_ivf"       -> (q34_ann_ivf _),
    "q64_label_centroids" -> (q64_label_centroids _),
    "q105_scalar_quant" -> (q105_scalar_quant _),
    "q110_knn_classify" -> (q110_knn_classify _),
    "q127_centroid_sim" -> (q127_centroid_sim _),
    "q152_ann_ivf_disk" -> (q152_ann_ivf_disk _),
    "q159_embed_covariance" -> (q159_embed_covariance _),
    "q160_hybrid_rrf"   -> (q160_hybrid_rrf _),
    "q168_pca_power"    -> (q168_pca_power _),
    "q176_pq_adc"       -> (q176_pq_adc _),
    "q177_mmr_rerank"   -> (q177_mmr_rerank _),
    "q179_ivfpq"        -> (q179_ivfpq _),
    "q182_linear_probe" -> (q182_linear_probe _),
    "q183_auc"          -> (q183_auc _),
    "q184_calibration_bins" -> (q184_calibration_bins _),
    "q189_retrieval_metrics" -> (q189_retrieval_metrics _),
    "q204_jl_projection" -> (q204_jl_projection _),
    "q241_embedding_contract" -> (q241_embedding_contract _),
    "q242_feature_matrix" -> (q242_feature_matrix _),
    "q249_target_encoding" -> (q249_target_encoding _),
    "q261_mann_whitney" -> (q261_mann_whitney _),
    "q264_skyline"      -> (q264_skyline _),
    "q268_hard_negatives" -> (q268_hard_negatives _),
    "q273_mann_kendall" -> (q273_mann_kendall _),
    "q316_isotonic_calibration" -> (q316_isotonic_calibration _),
    "q339_variant_ops"  -> (q339_variant_ops _),
    "q361_mmr_exact"    -> (q361_mmr_exact _),
    "q362_pca_first_step" -> (q362_pca_first_step _),
    "q363_probe_first_step" -> (q363_probe_first_step _),
    "q366_pq_mean_dial" -> (q366_pq_mean_dial _),
    "q367_ivfpq_mean_dial" -> (q367_ivfpq_mean_dial _),
  )

  private[graft] def mlOracle: Map[String, String] = Map(
    "q08_cosine_topk" ->
      """WITH probe AS (
        |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_dot_product(embedding::DOUBLE[], qv) /
        |        (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |         sqrt(list_dot_product(qv, qv))), 4) AS sim
        |FROM embeddings, probe WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q25_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
        |    AS cosine
        |FROM e a, e b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q361_mmr_exact" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |nrm AS (SELECT id,
        |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
        |p AS (SELECT nv AS pv FROM nrm WHERE id = 0),
        |c AS (SELECT id, list_dot_product(nv, pv) AS rel, nv
        |      FROM nrm, p WHERE id <> 0
        |      ORDER BY rel DESC, id LIMIT 50),
        |s1 AS (SELECT id, rel, nv, 0.7 * rel AS score FROM c
        |       ORDER BY rel DESC, id LIMIT 1),
        |s2 AS (SELECT c.id, c.rel,
        |         0.7 * c.rel - 0.3 * list_dot_product(c.nv, s1.nv) AS score
        |       FROM c, s1 WHERE c.id <> s1.id
        |       ORDER BY score DESC, c.id LIMIT 1)
        |SELECT 1 AS rank, id, round_even(rel * 10000, 0) / 10000 AS relevance,
        |       round_even(score * 10000, 0) / 10000 AS mmr_score FROM s1
        |UNION ALL
        |SELECT 2, id, round_even(rel * 10000, 0) / 10000,
        |       round_even(score * 10000, 0) / 10000 FROM s2
        |ORDER BY rank""".stripMargin,
    "q362_pca_first_step" ->
      """WITH ex AS (
        |  SELECT vec_id, i, embedding[i]::DOUBLE AS x
        |  FROM embeddings, range(1, 65) t(i)),
        |cov AS (
        |  SELECT a.i AS i, b.i AS j,
        |    sum(a.x * b.x) / count(*) -
        |      (sum(a.x) / count(*)) * (sum(b.x) / count(*)) AS c
        |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2),
        |covf AS (SELECT i, j, c FROM cov
        |         UNION ALL SELECT j, i, c FROM cov WHERE i <> j),
        |w AS (SELECT i, sum(c) AS wi FROM covf GROUP BY i),
        |nrm AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w),
        |vs AS (SELECT i, wi / nrm AS v FROM w, nrm),
        |sgn AS (SELECT CASE WHEN
        |    (SELECT v FROM vs WHERE abs(v) > 1e-12 ORDER BY i LIMIT 1) < 0
        |  THEN -1.0 ELSE 1.0 END AS sg),
        |v AS (SELECT i, v * sg AS v FROM vs, sgn),
        |proj AS (SELECT e.vec_id, sum(e.x * v.v) AS pc1
        |         FROM ex e JOIN v USING (i) GROUP BY e.vec_id),
        |rng AS (SELECT min(pc1) AS lo, max(pc1) AS hi FROM proj),
        |binned AS (
        |  SELECT greatest(0, least(floor((pc1 - lo) / ((hi - lo) / 10)), 9))::BIGINT AS bin,
        |    lo, hi
        |  FROM proj, rng)
        |SELECT bin, count(*) AS n,
        |  round(min(lo + bin * (hi - lo) / 10), 4) + 0.0 AS bin_lo
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,
    "q363_probe_first_step" ->
      """WITH x AS (
        |  SELECT vec_id, (label = 0)::INT AS y, i,
        |    CASE WHEN i <= 64 THEN embedding[i]::DOUBLE ELSE 1.0 END AS xj
        |  FROM embeddings, range(1, 66) t(i)),
        |g AS (SELECT i, avg((0.5 - y) * xj) AS gi FROM x GROUP BY i),
        |w AS (SELECT i, -0.5 * gi AS wi FROM g),
        |score AS (SELECT x.vec_id, any_value(x.y) AS y, sum(x.xj * w.wi) AS z
        |          FROM x JOIN w USING (i) GROUP BY x.vec_id),
        |p AS (SELECT vec_id, y, 1.0 / (1.0 + exp(-z)) AS p FROM score),
        |s AS (SELECT count(*) AS n,
        |        round(avg((((p >= 0.5)::INT = y))::INT::DOUBLE), 4) AS acc1,
        |        round(avg(-(y * ln(greatest(p, 1e-12)) +
        |                    (1 - y) * ln(greatest(1.0 - p, 1e-12)))), 4) AS loss1
        |      FROM p)
        |SELECT w.i - 1 AS pos, round(wi, 6) + 0.0 AS w1, s.n, s.acc1, s.loss1
        |FROM w, s ORDER BY pos""".stripMargin,
    "q366_pq_mean_dial" ->
      """WITH e AS (SELECT vec_id, i - 1 AS i0, embedding[i]::DOUBLE AS x
        |           FROM embeddings, range(1, 65) t(i)),
        |mean AS (SELECT i0 // 16 AS subspace, i0 % 16 AS dim, avg(x) AS c
        |         FROM e GROUP BY 1, 2),
        |probe AS (SELECT i0, x FROM e WHERE vec_id = 0),
        |d AS (SELECT sum((p.x - m.c) * (p.x - m.c)) AS d2
        |      FROM probe p JOIN mean m
        |        ON p.i0 // 16 = m.subspace AND p.i0 % 16 = m.dim)
        |SELECT m.subspace, m.dim, round(m.c, 6) + 0.0 AS centroid,
        |  3::BIGINT AS n_top, 1::BIGINT AS top1_id,
        |  round(d.d2, 4) + 0.0 AS adc_min, round(d.d2, 4) + 0.0 AS adc_max
        |FROM mean m, d ORDER BY subspace, dim""".stripMargin,
    "q367_ivfpq_mean_dial" ->
      """WITH raw AS (SELECT vec_id, i - 1 AS i0, embedding[i]::DOUBLE AS x
        |             FROM embeddings, range(1, 65) t(i)),
        |nv AS (SELECT vec_id, i0,
        |         x / sqrt(sum(x * x) OVER (PARTITION BY vec_id)) AS nv
        |       FROM raw),
        |mu AS (SELECT i0, avg(nv) AS m FROM nv WHERE vec_id <> 0 GROUP BY i0),
        |mn AS (SELECT sqrt(sum(m * m)) AS mn FROM mu),
        |c AS (SELECT i0, m / mn AS c FROM mu, mn),
        |pq AS (SELECT mu.i0, mu.m - c.c AS p FROM mu JOIN c ON mu.i0 = c.i0),
        |qn AS (SELECT i0, nv FROM nv WHERE vec_id = 0),
        |rq AS (SELECT q.i0, q.nv - c.c AS r FROM qn q JOIN c ON q.i0 = c.i0),
        |adc AS (SELECT sum((rq.r - pq.p) * (rq.r - pq.p)) AS d2
        |        FROM rq JOIN pq ON rq.i0 = pq.i0),
        |rows_ AS (
        |  SELECT 'coarse' AS kind, i0 AS dim, round(c, 6) + 0.0 AS value FROM c
        |  UNION ALL
        |  SELECT 'pq_res', i0, round(p, 6) + 0.0 FROM pq)
        |SELECT kind, dim, value, 10::BIGINT AS n_top, 1::BIGINT AS top1_id,
        |  10::BIGINT AS top10_id, round(adc.d2, 4) + 0.0 AS adc_min,
        |  round(adc.d2, 4) + 0.0 AS adc_max
        |FROM rows_, adc ORDER BY kind, dim""".stripMargin,
    "q64_label_centroids" ->
      """SELECT label, count(*) AS n,
        |  round(avg(embedding[1]::DOUBLE), 4) AS c1,
        |  round(avg(embedding[2]::DOUBLE), 4) AS c2,
        |  round(avg(embedding[3]::DOUBLE), 4) AS c3,
        |  round(avg(embedding[4]::DOUBLE), 4) AS c4,
        |  round(avg(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4)
        |    AS mean_sq_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q105_scalar_quant" ->
      """WITH ex AS (
        |  SELECT i AS dim, embedding[i]::DOUBLE AS x
        |  FROM embeddings, range(1, 65) t(i)),
        |st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY dim),
        |q AS (
        |  SELECT ex.dim, x, lo, hi, round(255 * (x - lo) / (hi - lo)) AS qv
        |  FROM ex JOIN st USING (dim))
        |SELECT dim, count(*) AS n, round(min(lo), 4) AS lo, round(min(hi), 4) AS hi,
        |  round(avg(abs(x - (lo + qv * (hi - lo) / 255))), 6) AS avg_abs_err,
        |  round(max(abs(x - (lo + qv * (hi - lo) / 255))), 6) AS max_abs_err
        |FROM q GROUP BY dim ORDER BY dim""".stripMargin,
    "q110_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS true_label, v AS qv
        |      FROM e WHERE vec_id % 101 = 0),
        |b AS (SELECT * FROM e WHERE vec_id % 101 <> 0),
        |sims AS (
        |  SELECT q.qid, q.true_label, b.vec_id, b.label,
        |    round(list_dot_product(b.v, q.qv) /
        |          (sqrt(list_dot_product(b.v, b.v)) *
        |           sqrt(list_dot_product(q.qv, q.qv))), 4) AS sim
        |  FROM q, b),
        |top AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, vec_id ASC) AS rn FROM sims) t
        |  WHERE rn <= 5),
        |votes AS (SELECT qid, true_label, label, count(*) AS votes
        |          FROM top GROUP BY qid, true_label, label),
        |pick AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY votes DESC, label ASC) AS vr FROM votes) t
        |  WHERE vr = 1)
        |SELECT qid AS vec_id, true_label, label AS pred_label, votes,
        |  (label = true_label)::INT AS correct
        |FROM pick ORDER BY vec_id""".stripMargin,
    "q127_centroid_sim" ->
      """WITH c AS (
        |  SELECT label, r.i AS i, avg(embedding[r.i]::DOUBLE) AS v
        |  FROM embeddings, range(1, 65) r(i) GROUP BY 1, 2),
        |n AS (SELECT label, sum(v * v) AS nn FROM c GROUP BY 1)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  round(sum(a.v * b.v) / (sqrt(na.nn) * sqrt(nb.nn)), 4) AS cos_sim
        |FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
        |JOIN n na ON na.label = a.label
        |JOIN n nb ON nb.label = b.label
        |GROUP BY a.label, b.label, na.nn, nb.nn
        |ORDER BY label_a, label_b""".stripMargin,
    "q159_embed_covariance" ->
      """WITH ex AS (
        |  SELECT vec_id, i, embedding[i]::DOUBLE AS x
        |  FROM embeddings, range(1, 65) t(i))
        |SELECT a.i AS i, b.i AS j,
        |  round(sum(a.x * b.x) / count(*) -
        |        (sum(a.x) / count(*)) * (sum(b.x) / count(*)), 4) + 0.0 AS cov
        |FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,
    "q160_hybrid_rrf" ->
      """WITH words AS (
        |  SELECT doc_id, w AS word FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
        |avgdl AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM words
        |       WHERE word IN ('spark', 'join', 'window') GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |bm AS (
        |  SELECT tf.doc_id,
        |    round(sum(ln(1.0 + ((SELECT n FROM n) - df + 0.5) / (df + 0.5))
        |              * tf * (1.2 + 1)
        |              / (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))), 3) AS bm25
        |  FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN avgdl
        |  GROUP BY tf.doc_id),
        |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm
        |        FROM bm),
        |probe AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |cos AS (
        |  SELECT vec_id,
        |    round(list_dot_product(embedding::DOUBLE[], qv) /
        |          (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |           sqrt(list_dot_product(qv, qv))), 4) + 0.0 AS sim
        |  FROM embeddings, probe WHERE vec_id <> 0),
        |cr AS (SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r_cos
        |       FROM cos)
        |SELECT coalesce(b.doc_id, c.vec_id) AS doc_id,
        |  round(coalesce(1.0 / (60 + r_bm), 0) + coalesce(1.0 / (60 + r_cos), 0), 6)
        |    AS rrf,
        |  coalesce(r_bm, -1) AS r_bm, coalesce(r_cos, -1) AS r_cos
        |FROM bmr b FULL JOIN cr c ON b.doc_id = c.vec_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q183_auc" ->
      """WITH p AS (SELECT embedding AS pv, label AS plab FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id,
        |        CASE WHEN e.label = p.plab THEN 1 ELSE 0 END AS y,
        |        list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[]) AS score
        |      FROM embeddings e CROSS JOIN p WHERE e.vec_id <> 0),
        |r AS (SELECT *, row_number() OVER (ORDER BY score, vec_id) AS rnk FROM s)
        |SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |  round((sum(CASE WHEN y = 1 THEN rnk END) - sum(y) * (sum(y) + 1) / 2.0)
        |        / (sum(y) * (count(*) - sum(y))), 4) AS auc
        |FROM r""".stripMargin,
    "q184_calibration_bins" ->
      """WITH p AS (SELECT embedding AS pv, label AS plab FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id,
        |        CASE WHEN e.label = p.plab THEN 1 ELSE 0 END AS y,
        |        list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[]) AS score
        |      FROM embeddings e CROSS JOIN p WHERE e.vec_id <> 0),
        |env AS (SELECT min(score) AS lo, max(score) AS hi FROM s)
        |SELECT least(floor((score - lo) / (hi - lo) * 10), 9)::BIGINT AS bin,
        |  count(*)::BIGINT AS n,
        |  round(avg(score), 4) AS mean_score,
        |  round(avg(y * 1.0), 4) AS frac_pos
        |FROM s CROSS JOIN env
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "q189_retrieval_metrics" ->
      """WITH p AS (SELECT embedding AS pv, label AS plab FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id,
        |        CASE WHEN e.label = p.plab THEN 1 ELSE 0 END AS y,
        |        list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[]) AS score
        |      FROM embeddings e CROSS JOIN p WHERE e.vec_id <> 0),
        |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, vec_id) AS rnk FROM s),
        |a AS (SELECT sum(y)::BIGINT AS n_pos,
        |        sum(CASE WHEN rnk <= 10 THEN y ELSE 0 END)::BIGINT AS hits10,
        |        sum(CASE WHEN rnk <= 10 THEN y / log2(rnk + 1) ELSE 0 END) AS dcg,
        |        max(CASE WHEN y = 1 THEN 1.0 / rnk END) AS mrr
        |      FROM r)
        |SELECT n_pos, hits10,
        |  round(hits10 * 1.0 / n_pos, 4) AS recall10,
        |  round(mrr, 4) AS mrr,
        |  round(dcg / list_sum([1.0 / log2(i + 1) for i in range(1, least(10, n_pos) + 1)]), 4) AS ndcg10
        |FROM a""".stripMargin,
    "q204_jl_projection" ->
      """SELECT vec_id,
        |  round(list_sum([CASE WHEN substr(md5('0_' || (i-1)::VARCHAR), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7')
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, len(embedding)+1)]), 4) AS p0,
        |  round(list_sum([CASE WHEN substr(md5('1_' || (i-1)::VARCHAR), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7')
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, len(embedding)+1)]), 4) AS p1,
        |  round(list_sum([CASE WHEN substr(md5('2_' || (i-1)::VARCHAR), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7')
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, len(embedding)+1)]), 4) AS p2,
        |  round(list_sum([CASE WHEN substr(md5('3_' || (i-1)::VARCHAR), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7')
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, len(embedding)+1)]), 4) AS p3
        |FROM embeddings WHERE vec_id < 15 ORDER BY vec_id""".stripMargin,
    "q241_embedding_contract" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  (count(*) - count(DISTINCT vec_id))::BIGINT AS dup_ids,
        |  sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_vectors,
        |  sum(CASE WHEN len(list_filter(embedding,
        |        v -> isnan(v::DOUBLE) OR abs(v::DOUBLE) = 'infinity'::DOUBLE)) > 0
        |      THEN 1 ELSE 0 END)::BIGINT AS nonfinite_vectors,
        |  count(DISTINCT len(embedding))::BIGINT AS n_dims_seen,
        |  sum(CASE WHEN list_sum([v::DOUBLE * v::DOUBLE for v in embedding]) = 0
        |      THEN 1 ELSE 0 END)::BIGINT AS zero_vectors,
        |  round(min(CASE WHEN embedding IS NOT NULL AND len(list_filter(embedding,
        |      v -> isnan(v::DOUBLE) OR abs(v::DOUBLE) = 'infinity'::DOUBLE)) = 0
        |    THEN sqrt(list_sum([v::DOUBLE * v::DOUBLE for v in embedding])) END), 4)
        |    AS min_norm,
        |  round(max(CASE WHEN embedding IS NOT NULL AND len(list_filter(embedding,
        |      v -> isnan(v::DOUBLE) OR abs(v::DOUBLE) = 'infinity'::DOUBLE)) = 0
        |    THEN sqrt(list_sum([v::DOUBLE * v::DOUBLE for v in embedding])) END), 4)
        |    AS max_norm
        |FROM embeddings""".stripMargin,
    "q242_feature_matrix" ->
      """WITH f AS (SELECT max(ts::DATE) AS now FROM events),
        |u AS (SELECT user_id,
        |    sum(CASE WHEN now - ts::DATE < 7 THEN 1 ELSE 0 END)::BIGINT AS events_7d,
        |    sum(CASE WHEN now - ts::DATE < 14 THEN 1 ELSE 0 END)::BIGINT AS events_14d,
        |    sum(CASE WHEN now - ts::DATE < 28 THEN 1 ELSE 0 END)::BIGINT AS events_28d,
        |    min(now - ts::DATE)::BIGINT AS recency_d,
        |    count(DISTINCT event_type)::BIGINT AS n_event_types,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN round(value * 100, 0)::BIGINT ELSE 0 END)::BIGINT AS spend_cents,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors
        |  FROM events, f GROUP BY user_id)
        |SELECT * FROM u WHERE user_id % 10 = 0 ORDER BY user_id""".stripMargin,
    "q249_target_encoding" ->
      """WITH p AS (SELECT p_partkey, p_brand,
        |    round(p_retailprice * 100, 0)::BIGINT AS cents FROM part),
        |g AS (SELECT p_brand, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
        |      FROM p GROUP BY p_brand)
        |SELECT p_partkey, p.p_brand, n,
        |  CASE WHEN n > 1
        |    THEN round((s - cents)::DOUBLE / ((n - 1) * 100.0), 4) END AS loo_mean
        |FROM p JOIN g ON p.p_brand = g.p_brand
        |WHERE p_partkey <= 40
        |ORDER BY p_partkey""".stripMargin,
    "q261_mann_whitney" ->
      """WITH g AS (
        |  SELECT value,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1 END)::BIGINT AS na_v,
        |    sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)::BIGINT AS nb_v
        |  FROM events WHERE event_type = 'purchase' GROUP BY value),
        |c AS (SELECT *, na_v + nb_v AS cnt,
        |    sum(na_v + nb_v) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM g),
        |a AS (SELECT sum(na_v)::BIGINT AS n_a, sum(nb_v)::BIGINT AS n_b,
        |    sum(na_v * (2 * cum - cnt + 1))::BIGINT AS r2a,
        |    sum(cnt * cnt * cnt - cnt)::BIGINT AS tie3 FROM c)
        |SELECT n_a, n_b,
        |  (r2a - n_a * (n_a + 1)) / 2.0 AS u_a,
        |  round(((r2a - n_a * (n_a + 1)) / 2.0 - n_a * n_b / 2.0) /
        |    sqrt(n_a * n_b / 12.0 *
        |      ((n_a + n_b + 1) - tie3 / ((n_a + n_b) * (n_a + n_b - 1.0)))), 4) AS z
        |FROM a""".stripMargin,
    "q264_skyline" ->
      """WITH g AS (SELECT o_totalprice, max(o_orderdate) AS maxd
        |           FROM orders GROUP BY o_totalprice),
        |p AS (SELECT *, max(maxd) OVER (ORDER BY o_totalprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax FROM g),
        |s AS (SELECT o_totalprice, maxd FROM p
        |      WHERE prevmax IS NULL OR maxd > prevmax)
        |SELECT o_orderkey, o.o_totalprice, o_orderdate
        |FROM orders o JOIN s ON o.o_totalprice = s.o_totalprice
        |  AND o.o_orderdate = s.maxd
        |ORDER BY o.o_totalprice, o_orderkey""".stripMargin,
    "q268_hard_negatives" ->
      """WITH probes AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (SELECT qid, vec_id,
        |    round(list_dot_product(embedding::DOUBLE[], qv) /
        |      (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(qv, qv))), 4) AS sim
        |  FROM embeddings, probes WHERE vec_id >= 5),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, vec_id ASC)::BIGINT AS rnk FROM scored)
        |SELECT qid, rnk,
        |  CASE WHEN rnk = 1 THEN 'positive' ELSE 'hard_negative' END AS role,
        |  vec_id, sim
        |FROM r WHERE rnk = 1 OR rnk BETWEEN 11 AND 13
        |ORDER BY qid, rnk""".stripMargin,
    "q273_mann_kendall" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, round(sum(value), 2) AS rev FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |ss AS (SELECT sum(sign(b.rev - a.rev))::BIGINT AS s_stat
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |ties AS (SELECT sum(tg * (tg - 1) * (2 * tg + 5))::BIGINT AS tie18,
        |    sum(tg)::BIGINT AS n
        |  FROM (SELECT count(*)::BIGINT AS tg FROM daily GROUP BY rev))
        |SELECT n AS n_days, s_stat,
        |  CASE WHEN n * (n - 1) * (2 * n + 5) - tie18 > 0 THEN
        |    round(CASE WHEN s_stat > 0 THEN (s_stat - 1) /
        |        sqrt((n * (n - 1) * (2 * n + 5) - tie18) / 18.0)
        |      WHEN s_stat < 0 THEN (s_stat + 1) /
        |        sqrt((n * (n - 1) * (2 * n + 5) - tie18) / 18.0)
        |      ELSE 0.0 END, 4) END AS z
        |FROM ss, ties""".stripMargin,
    "q316_isotonic_calibration" ->
      """WITH p AS (SELECT embedding AS pv, label AS plab FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id,
        |        CASE WHEN e.label = p.plab THEN 1 ELSE 0 END AS y,
        |        list_dot_product(e.embedding::DOUBLE[], p.pv::DOUBLE[]) AS score
        |      FROM embeddings e CROSS JOIN p WHERE e.vec_id <> 0),
        |env AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
        |b AS (SELECT least(floor((score - lo) / (hi - lo) * 10), 9)::BIGINT AS bin,
        |        count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
        |        round(avg(score), 4) AS mean_score,
        |        round(avg(y * 1.0), 4) AS frac_pos
        |      FROM s CROSS JOIN env GROUP BY 1),
        |iv AS (SELECT j.bin AS j, k.bin AS k,
        |        sum(x.sy) * 1.0 / sum(x.n) AS avg_jk
        |      FROM b j, b k, b x
        |      WHERE j.bin <= k.bin AND x.bin BETWEEN j.bin AND k.bin
        |      GROUP BY 1, 2),
        |m AS (SELECT i.bin AS bin, iv.j AS j, min(iv.avg_jk) AS mn
        |      FROM b i, iv WHERE iv.j <= i.bin AND iv.k >= i.bin
        |      GROUP BY 1, 2),
        |f AS (SELECT bin, max(mn) AS iso FROM m GROUP BY 1)
        |SELECT b.bin, b.n, b.mean_score, b.frac_pos,
        |  round(f.iso, 6) AS iso_fit
        |FROM b JOIN f USING (bin) ORDER BY b.bin""".stripMargin,
    "q339_variant_ops" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  min(json_extract(props, '$.k')::BIGINT) AS min_k,
        |  max(json_extract(props, '$.k')::BIGINT) AS max_k,
        |  count(json_extract(props, '$.zz')::BIGINT)::BIGINT AS n_zz
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_ann_ivf" ->
      """WITH n AS (
        |  SELECT vec_id AS id,
        |    list_transform(embedding::DOUBLE[],
        |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
        |                                     embedding::DOUBLE[]))) AS nv
        |  FROM embeddings),
        |p AS (SELECT nv AS qnv FROM n WHERE id = 0)
        |SELECT id, round(list_dot_product(nv, qnv), 4) AS sim
        |FROM n, p WHERE id <> 0
        |ORDER BY sim DESC, id ASC LIMIT 10""".stripMargin,
    // Discrete quantiles (actual price at the integer rank
    // ⌊(n−1)·p⌋+1, computed with INTEGER arithmetic — no float h, no
    // round()) so no cross-engine rounding boundary exists; the
    // interpolated form and the sketch are judged via flags.
    "q152_ann_ivf_disk" ->
      """WITH n AS (
        |  SELECT vec_id AS id,
        |    list_transform(embedding::DOUBLE[],
        |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
        |                                     embedding::DOUBLE[]))) AS nv
        |  FROM embeddings),
        |p AS (SELECT nv AS qnv FROM n WHERE id = 0)
        |SELECT id, round(list_dot_product(nv, qnv), 4) AS sim
        |FROM n, p WHERE id <> 0
        |ORDER BY sim DESC, id ASC LIMIT 10""".stripMargin,
  )
}
