package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA's top principal component via distributed covariance + driver
  * power iteration — the dimensionality primitive behind embedding
  * whitening, drift monitoring, and "is this corpus one blob or two"
  * diagnostics in a training pipeline.
  *
  * Split of labor (the [[AnnIvf]] Lloyd pattern): everything O(n) is
  * distributed, everything O(d^2) is driver-local.
  *
  *   1. COVARIANCE (distributed): posexplode + self-join on the row
  *      id fans each vector out to its d(d+1)/2 upper-triangle
  *      products, and ONE hash aggregation map-side-combines the fan
  *      -out down to d(d+1)/2 groups per partition — the shuffle
  *      carries ~2080 rows regardless of corpus size (q159's shape).
  *   2. EIGENVECTOR (driver): power iteration on the collected d x d
  *      matrix. Deterministic: fixed all-ones start, fixed iteration
  *      count, sign normalized so the first nonzero component is
  *      positive. d=64 → microseconds; never worth a cluster round.
  *   3. PROJECTION (distributed): the eigenvector goes back as a
  *      broadcast literal; scoring is one narrow codegen'd dot
  *      product per row, and the judged histogram is a single
  *      aggregation over exact integer bin ids.
  *
  * Caveat the scaladoc owes its reader: power iteration converges to
  * the dominant eigenvector at rate (λ2/λ1)^t — for a spectrum with
  * λ2 ≈ λ1 (isotropic corpora) the direction within the top eigen-
  * space is iteration-count-dependent, but the REPORTED quantities
  * (projection variance, histogram) are stable because any vector in
  * that eigenspace scores the same variance.
  */
object Pca {

  /** Mean-centered covariance matrix of the vector column, collected
    * to the driver as a dense d x d symmetric array. `idCol` keys the
    * self-join (a real column, not monotonically_increasing_id —
    * synthetic ids are partition-layout-dependent and the join
    * re-executes the child lineage on both sides).
    */
  def covarianceMatrix(df: DataFrame, idCol: String, vecCol: String, dim: Int): Array[Array[Double]] = {
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ex = df
      .select(col(idCol).as("rid"),
        posexplode(transform(col(vecCol), x => x.cast("double"))).as(Seq("i", "x")))
      .repartition(nPart, col("rid"))
    val b = ex.select(col("rid").as("rid2"), col("i").as("j"), col("x").as("y"))
    val rows = ex.join(b, col("rid") === col("rid2") && col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("x") * col("y")).as("sxy"),
        sum("x").as("sx"), sum("y").as("sy"))
      .select(col("i"), col("j"),
        (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))).as("cov"))
      .collect()
    val m = Array.fill(dim, dim)(0.0)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val c = r.getDouble(2)
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Dominant eigenvector by `iters` power-iteration rounds from the
    * all-ones start; sign-normalized (first component with magnitude
    * > 1e-12 is positive) so callers get a deterministic direction.
    */
  def topEigenvector(cov: Array[Array[Double]], iters: Int = 50): Array[Double] = {
    val d = cov.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0; var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        w(i) = s; i += 1
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      v = if (n == 0.0) v else w.map(_ / n)
      it += 1
    }
    val lead = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
    if (lead < 0) v.map(-_) else v
  }

  /** Per-row projection onto the component: (idCol, pc1). */
  def project(df: DataFrame, idCol: String, vecCol: String, component: Array[Double]): DataFrame =
    df.select(col(idCol),
      graft.expr.VectorExpressions.dot(
        transform(col(vecCol), x => x.cast("double")),
        typedLit(component.toSeq)).as("pc1"))

  /** Judged histogram: PC1 scores cut into `nBins` equal-width bins
    * over the exact [min, max] score range. Bin ids, bounds, and
    * counts are all deterministic (min/max are order-free; the bin id
    * is integer arithmetic on exact doubles; no floating-point SUM
    * crosses a rounding boundary).
    */
  def projectionHistogram(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nBins: Int,
      powerIters: Int = 50): DataFrame = {
    val v = topEigenvector(covarianceMatrix(df, idCol, vecCol, dim), powerIters)
    val scored = project(df, idCol, vecCol, v)
    // 1-row range frame rides in as a broadcast crossJoin (q81's
    // pattern — no eager driver action during plan construction).
    val range = scored.agg(min("pc1").as("lo"), max("pc1").as("hi"))
    scored.crossJoin(broadcast(range))
      .select(when(col("hi") === col("lo"), lit(0L)) // degenerate range
        // Clamped BOTH ends: lo/hi come from a separate aggregation
        // over the same (unmaterialized) scored frame, so the min
        // row's (pc1 - lo) can re-compute one ULP NEGATIVE (different
        // partial-sum association order between the two scans) and
        // floor() would emit bin -1. greatest/least pin the extreme
        // rows to bins 0 and nBins-1 deterministically.
        .otherwise(greatest(lit(0L), least(
          floor((col("pc1") - col("lo")) / ((col("hi") - col("lo")) / nBins)),
          lit(nBins - 1L))).cast("long")).as("bin"),
        col("pc1"), col("lo"), col("hi"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        (round(min(col("lo") + col("bin") * (col("hi") - col("lo")) / nBins), 4) + 0.0)
          .as("bin_lo"))
      .orderBy("bin")
  }
}
