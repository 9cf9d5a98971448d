package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor (inverted-file index, the
  * FAISS coarse-quantizer pattern) in pure DataFrame ops:
  *
  *  - BUILD: seed `nCentroids` centroids from a deterministic hash
  *    sample of the corpus and refine them with a few distributed
  *    Lloyd rounds (the k-means|| shape: cheap sample, then
  *    assignment+mean passes that never shuffle vectors), then assign
  *    every vector to its nearest centroid. One broadcast of the
  *    centroid set + one narrow pass.
  *  - SEARCH: assign the probe to its `nProbe` nearest centroids, scan
  *    ONLY those inverted lists (a partition-pruned fraction ~
  *    nProbe/nCentroids of the data), exact re-rank inside.
  *
  * At 100 TB the assignment pass writes the table partitioned/bucketed
  * by `centroid_id`; every later query prunes to nProbe buckets —
  * that's the IVF win: query cost O(n·nProbe/nCentroids), not O(n).
  * Recall < 1 when a true neighbor's vector sits in a non-probed cell;
  * raise nProbe to trade cost for recall (nProbe = nCentroids ≡ exact).
  */
object AnnIvf {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))
  /** Native codegen'd dot product (graft.expr.DotProduct) — the
    * interpreted `aggregate(zip_with(...))` form dominated the bench
    * on quadratic pair joins.
    */
  private def dot(a: Column, b: Column): Column =
    graft.expr.VectorExpressions.dot(a, b)

  /** Unit-normalized corpus: (id, nv), the norm in its own projection
    * (computed once per row). PUBLIC so a caller running BOTH the
    * centroid build and the assignment (the standard index build, q34)
    * can normalize ONCE, persist, and hand the same frame to
    * [[centroidsNormed]] and [[assignNormed]] — the per-row sqrt+divide
    * over the full corpus is the dominant map cost, and the naive
    * compose-by-name form re-ran it four times (seed sample, each Lloyd
    * round, final assign).
    */
  def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .select(col("id"), col("v"), sqrt(dot(col("v"), col("v"))).as("norm"))
      .select(col("id"), transform(col("v"), x => x / col("norm")).as("nv"))

  /** Scores a normalized vector column `nv` against the centroid set;
    * returns the argmax centroid id (ties break toward the higher id).
    * Shared by assign() and the Lloyd rounds. One native expression
    * with the matrix as a codegen reference object — the earlier
    * greatest-of-structs form inlined k×d literal doubles into the
    * generated source and janino recompiled it for every Lloyd round's
    * fresh literals (the compile time, not the scan, dominated q34).
    */
  private def bestCell(cvs: Seq[(Long, Seq[Double])]): Column = {
    require(cvs.nonEmpty, "empty centroid set")
    graft.expr.VectorExpressions.nearestCentroid(
      col("nv"), cvs.map(_._1).toArray, cvs.map(_._2.toArray).toArray)
  }

  /** The centroid table: `nCentroids` seeds drawn as the lowest
    * `xxhash64(id)` rows — a DETERMINISTIC uniform sample of the
    * corpus, independent of id order (lowest-ID seeding degenerates
    * whenever ids correlate with content: a sorted/clustered corpus
    * puts every seed inside one cluster and the index stops
    * separating the data) — then refined with `refineIters` Lloyd
    * (k-means) rounds. Each round is the same narrow literal-inlined
    * assignment as assign() plus ONE tiny aggregation keyed by
    * (cell, dimension) — nCentroids×dim partial-aggregated rows to the
    * driver, no vector shuffle — i.e. the k-means|| shape: sample,
    * then cheap distributed refinement. Empty cells keep their seed.
    * Cell ids stay the seed vector ids (stable labels for
    * partitioning). Tiny → always broadcast.
    */
  def centroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      refineIters: Int = 2): DataFrame = {
    // Every consumer below is an eager collect, so the normalized
    // corpus can be cached for the duration of this call and released
    // before returning — the sample + refineIters rounds normalize once.
    val normed = normalized(df, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try centroidsNormed(normed, nCentroids, refineIters)
    finally normed.unpersist(blocking = false)
  }

  /** [[centroids]] over an already-normalized (id, nv) frame — persist
    * it if you also feed [[assignNormed]] (q34's shape).
    */
  def centroidsNormed(
      normed: DataFrame,
      nCentroids: Int,
      refineIters: Int = 2): DataFrame = {
    val spark = normed.sparkSession
    import spark.implicits._
    var cvs: Seq[(Long, Seq[Double])] = normed
      .orderBy(xxhash64(col("id")), col("id")).limit(nCentroids)
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    for (_ <- 0 until refineIters) {
      val byCell = normed
        .select(bestCell(cvs).as("cid"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("mx"))
        .collect()
        .groupBy(_.getLong(0))
      cvs = cvs.map { case (cid, old) =>
        byCell.get(cid).fold((cid, old)) { rows =>
          val mean = new Array[Double](old.length)
          rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2))
          val norm = math.sqrt(mean.map(x => x * x).sum)
          if (norm == 0.0) (cid, old) else (cid, mean.map(_ / norm).toSeq)
        }
      }
    }
    cvs.toDF("centroid_id", "cv")
  }

  /** BUILD: assign every vector to its nearest centroid (max cosine =
    * max dot of unit vectors). The centroid set is tiny by
    * construction, so it is collected once and inlined as LITERAL
    * vectors: the whole assignment is one narrow projection —
    * nCentroids native dot products + a `greatest` argmax per row, NO
    * crossJoin row expansion and NO shuffle (the earlier
    * crossJoin+groupBy form shuffled every normalized vector). Ties
    * break toward the higher centroid id (struct ordering).
    * Output: (id, nv, centroid_id) — the inverted file.
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame =
    assignNormed(normalized(df, idCol, vecCol), cents)

  /** [[assign]] over an already-normalized (id, nv) frame. */
  def assignNormed(normed: DataFrame, cents: DataFrame): DataFrame = {
    val cvs: Seq[(Long, Seq[Double])] = cents.collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Double](1)))
    normed.select(col("id"), col("nv"), bestCell(cvs).as("centroid_id"))
  }

  /** Persist the inverted file partitioned by cell: each centroid's
    * list is its own directory, so a search's cell pruning happens at
    * the FILE LISTING — non-probed cells are never opened. This is the
    * on-storage form of the IVF win; `search` over `readIndex` output
    * prunes via `PartitionFilters` (asserted in AnnIvfSpec).
    */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** SEARCH: probe vector → its nProbe nearest centroids → exact top-k
    * over just those cells.
    */
  def search(
      index: DataFrame, // output of assign()
      cents: DataFrame,
      probe: DataFrame, // single row with vecCol
      vecCol: String,
      k: Int,
      nProbe: Int): DataFrame = {
    val qn = normalized(probe.select(lit(0L).as("pid"), col(vecCol)), "pid", vecCol)
      .select(col("nv").as("qnv"))
    val probeCells = cents.crossJoin(broadcast(qn))
      .select(col("centroid_id"), dot(col("cv"), col("qnv")).as("csim"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
      .limit(nProbe)
      .select("centroid_id")
    index
      .join(broadcast(probeCells), Seq("centroid_id")) // cell pruning
      .crossJoin(broadcast(qn))
      .select(col("id"), round(dot(col("nv"), col("qnv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }
}
