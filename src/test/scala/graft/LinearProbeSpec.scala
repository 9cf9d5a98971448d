package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearProbe

/** Linear probe: convex-descent sanity, separable-data accuracy, and
  * the judged summary query.
  */
class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable 8-d data: class = sign of the first coordinate,
  // margin 1, deterministic jitter elsewhere.
  private def separable() =
    (0 until 200).map { i =>
      val y = i % 2
      val x0 = if (y == 1) 1.5 + 0.01 * (i % 7) else -1.5 - 0.01 * (i % 7)
      (i.toLong, Array.tabulate(8)(j =>
        if (j == 0) x0 else 0.1 * ((i * 13 + j) % 5 - 2)), y)
    }

  test("loss decreases monotonically-ish and accuracy reaches 1.0 on separable data") {
    val df = separable().toDF("id", "embedding", "y")
    val fit = LinearProbe.train(df, "embedding", "y", iters = 20, lr = 0.5)
    assert(fit.lossPerIter.head > fit.lossPerIter.last,
      s"loss did not decrease: ${fit.lossPerIter}")
    // full-batch GD on a convex loss with modest lr: no iteration may
    // blow the loss up by more than a hair
    fit.lossPerIter.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a + 0.05, s"loss jumped: $a -> $b") }
    val acc = LinearProbe.predict(df, "embedding", fit)
      .agg(avg((col("yhat") === col("y")).cast("double"))).first().getDouble(0)
    assert(acc == 1.0, s"separable data not separated: acc=$acc")
  }

  test("the probe weight aligns with the separating dimension") {
    val df = separable().toDF("id", "embedding", "y")
    val fit = LinearProbe.train(df, "embedding", "y", iters = 20, lr = 0.5)
    val w = fit.weights
    assert(w(0) > 0, "first-coordinate weight must be positive")
    assert(math.abs(w(0)) > w.tail.dropRight(1).map(math.abs).max,
      s"separating weight not dominant: ${w.mkString(",")}")
  }

  test("judged query q182 returns one summary row with sane fields") {
    val r = Queries.all("q182_linear_probe")(spark, sf()).collect()
    assert(r.length == 1)
    val acc = r.head.getDouble(1)
    // label==0 is ~10% of rows; predicting all-negative already gives
    // ~0.9 — the probe must not be WORSE than the base rate.
    assert(acc >= 0.85 && acc <= 1.0, s"acc out of range: $acc")
    assert(r.head.getDouble(3) > 0.0) // weight norm moved off zero
  }

  test("q183 AUC of a perfect ranker is 1.0 and of an inverted ranker is 0.0") {
    import graft.operators.PrefixSum
    val df = (1 to 100).map(i => (i.toLong, if (i <= 40) 1L else 0L,
      if (i <= 40) 100.0 + i else i.toDouble)).toDF("vec_id", "y", "score")
    def auc(d: org.apache.spark.sql.DataFrame): Double =
      PrefixSum.globalRank(d, Seq("score", "vec_id"), "rnk")
        .agg(((sum(when(col("y") === 1, col("rnk"))) -
          sum("y") * (sum("y") + 1) / lit(2.0)) /
          (sum("y") * (count(lit(1)) - sum("y")))).as("auc"))
        .first().getDouble(0)
    assert(auc(df) == 1.0)
    assert(auc(df.withColumn("score", -col("score"))) == 0.0)
  }
}
