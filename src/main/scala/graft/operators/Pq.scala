package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the FAISS `PQm`
  * compression/search scheme in pure DataFrame ops plus two native
  * expressions:
  *
  *  - TRAIN: split the d-dim space into `m` subspaces of d/m dims and
  *    fit a k-cell codebook per subspace with Lloyd's algorithm over a
  *    bounded, hash-deterministic sample COLLECTED TO THE DRIVER. This
  *    mirrors FAISS practice (codebooks train on ~10⁴-10⁵ sampled
  *    vectors regardless of corpus size), so the collect is O(sampleN·d)
  *    by construction, never O(corpus).
  *  - ENCODE: one narrow map pass; each subvector is assigned its
  *    nearest cell via [[graft.expr.NearestCentroid]] (argmax-dot) on
  *    an AUGMENTED subvector — argmin‖x−c‖² ⟺ argmax(x·c − ‖c‖²/2),
  *    so appending a constant 1.0 to x and −‖c‖²/2 to each centroid
  *    turns L2 assignment into the dot-product argmax the existing
  *    codegen expression already does. Output is m small ints per row:
  *    d·4 bytes of float32 → m bytes of codes (64× at d=64, m=4 with
  *    k≤256), which is what makes a 100 TB corpus scannable from RAM.
  *  - SEARCH (ADC): the probe builds an m×k distance table ONCE on the
  *    driver (dtab(j)(c) = ‖q_j − cell(j,c)‖²); the scan is then a
  *    per-row table lookup via [[graft.expr.AdcLookup]] — no float
  *    vectors are read at all. Top-k by (adc_dist, id) plans
  *    TakeOrderedAndProject; the exact re-rank joins the raw vectors
  *    back for ONLY the k survivors.
  *
  * Determinism: the training sample is `orderBy(xxhash64(id), id)` +
  * limit (no RNG), Lloyd iterates in array order on the driver, and
  * all tie-breaks go through (value, id) lexicographic compare.
  */
object Pq {

  /** cells(j)(c) is the c-th centroid of subspace j (length subDim).
    * Per-subspace cell counts may fall below `k` when the training
    * sample has fewer than k distinct subvectors (tiny/degenerate
    * corpora) — codes stay valid, the codebook is just smaller.
    */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      cells: Array[Array[Array[Double]]]) {
    require(cells.length == m && cells.forall(c => c.nonEmpty && c.length <= k))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Train per-subspace codebooks on a deterministic sample.
    *
    * @param sampleN driver-side sample size — the ONLY driver
    *   materialization, bounded by construction (FAISS trains PQ
    *   codebooks on samples of this order at any corpus size).
    */
  def train(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, sampleN: Int = 2048, rounds: Int = 5): Codebooks = {
    // TakeOrdered (no full sort): hash-deterministic sample.
    val rows = df
      .select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .collect()
    require(rows.nonEmpty, "empty training set")
    val sample = rows.map(_.getSeq[Double](1).toArray)
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val cells = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      lloyd(sub, k, rounds)
    }
    Codebooks(m, k, subDim, cells)
  }

  /** Driver-local Lloyd over the (bounded) sample, seeded by
    * DETERMINISTIC farthest-point (maximin) traversal: seed 1 is the
    * first sample vector, each next seed the point maximizing distance
    * to the chosen set (ties → lower index). Unlike first-k-in-hash-
    * order, maximin provably lands one seed in every well-separated
    * cluster before spending seeds inside clusters — Lloyd cannot
    * split a merged cell on its own, so coverage must come from the
    * seeding. Empty cells keep their previous centroid (standard fix).
    */
  private def lloyd(xs: Array[Array[Double]], k: Int, rounds: Int): Array[Array[Double]] = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val seeds = scala.collection.mutable.ArrayBuffer(xs.head)
    val minD = xs.map(d2(_, xs.head))
    var saturated = false // all remaining points duplicate a seed
    while (!saturated && seeds.length < math.min(k, xs.length)) {
      var best = 0
      for (i <- xs.indices if minD(i) > minD(best)) best = i
      if (minD(best) <= 0.0) saturated = true
      else {
        seeds += xs(best)
        for (i <- xs.indices) minD(i) = math.min(minD(i), d2(xs(i), xs(best)))
      }
    }
    val cents = seeds.map(_.clone()).toArray
    def nearest(x: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var s = 0.0; var i = 0
        while (i < x.length) { val t = x(i) - cents(c)(i); s += t * t; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until rounds) {
      val sums = Array.fill(cents.length, xs.head.length)(0.0)
      val counts = Array.fill(cents.length)(0L)
      for (x <- xs) {
        val c = nearest(x)
        counts(c) += 1
        var i = 0
        while (i < x.length) { sums(c)(i) += x(i); i += 1 }
      }
      for (c <- cents.indices if counts(c) > 0; i <- cents(c).indices)
        cents(c)(i) = sums(c)(i) / counts(c)
    }
    cents
  }

  /** Augment centroids for the argmax-dot ⟺ argmin-L2 trick. */
  private def augmented(cb: Codebooks, j: Int): Array[Array[Double]] =
    cb.cells(j).map { c =>
      val norm2 = c.map(x => x * x).sum
      c :+ (-norm2 / 2.0)
    }

  /** The m-code array as a composable Column, so callers carrying
    * extra columns (e.g. IvfPq's centroid_id) encode in the same
    * narrow pass instead of joining a second scan back on.
    */
  def codesColumn(vec: Column, cb: Codebooks): Column = {
    val v = asDouble(vec)
    val codeCols = (0 until cb.m).map { j =>
      val sub = concat(slice(v, j * cb.subDim + 1, cb.subDim), array(lit(1.0)))
      graft.expr.VectorExpressions
        .nearestCentroid(sub, Array.tabulate(cb.cells(j).length)(_.toLong), augmented(cb, j))
        .cast("int")
    }
    array(codeCols: _*)
  }

  /** One narrow pass: (id, codes array<int> of length m). */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame =
    df.select(col(idCol).as("id"), codesColumn(col(vecCol), cb).as("codes"))

  /** Probe-side distance table: dtab(j)(c) = ‖q_j − cell(j,c)‖². */
  def distanceTable(cb: Codebooks, probe: Array[Double]): Array[Array[Double]] = {
    require(probe.length == cb.m * cb.subDim, "probe dim mismatch")
    Array.tabulate(cb.m) { j =>
      cb.cells(j).map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { val t = probe(j * cb.subDim + i) - c(i); s += t * t; i += 1 }
        s
      }
    }
  }

  /** ADC top-k over an encoded table: (id, adc_dist), smallest first,
    * (dist, id) tie-break — plans TakeOrderedAndProject.
    */
  def searchTopK(codes: DataFrame, cb: Codebooks, probe: Array[Double], k: Int): DataFrame =
    codes
      .select(col("id"),
        graft.expr.VectorExpressions.adcLookup(col("codes"), distanceTable(cb, probe))
          .as("adc_dist"))
      .orderBy(col("adc_dist"), col("id"))
      .limit(k)
}
