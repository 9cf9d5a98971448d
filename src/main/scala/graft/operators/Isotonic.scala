package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) regression over a BOUNDED
  * ordered frame of (position, weight, weighted-sum) rows, solved by
  * the minimax characterization of the pool-adjacent-violators
  * algorithm:
  *
  *   fit(i) = max_{j ≤ i} min_{k ≥ i} ( Σ_{j..k} sy / Σ_{j..k} n )
  *
  * Three bounded self-joins (≤ B³ combinations for B input rows)
  * instead of PAVA's sequential pool loop — order-free, engine-exact
  * (every interval average is ONE division of exact integer/decimal
  * sums), and trivially distributed. The intended caller shape is a
  * calibration-bin or decile frame (B ≤ ~100): the corpus-sized work
  * happens BEFORE this operator in the binning aggregate, so the
  * cubic term is bounded by the bin count, never the data
  * (IsotonicSpec pins the classic pooling cases; q316 runs it over
  * q184's reliability bins).
  */
object Isotonic {

  /** Fit over `bins`: `binCol` (orderable position), `nCol` (weight
    * > 0), `syCol` (weighted label sum). Returns (binCol, iso) — the
    * monotone fit per position, unrounded.
    */
  def fit(bins: DataFrame, binCol: String, nCol: String, syCol: String): DataFrame = {
    val jf = bins.select(col(binCol).as("j"))
    val kf = bins.select(col(binCol).as("k"))
    val xf = bins.select(col(binCol).as("x"), col(nCol).as("xn"), col(syCol).as("xs"))
    val iv = jf.crossJoin(broadcast(kf)).filter(col("j") <= col("k"))
      .join(broadcast(xf), col("x").between(col("j"), col("k")))
      .groupBy("j", "k")
      .agg((sum("xs").cast("double") / sum("xn")).as("avg_jk"))
    bins.select(col(binCol).as("i"))
      .join(broadcast(iv), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("avg_jk").as("mn"))
      .groupBy("i").agg(max("mn").as("iso"))
      .select(col("i").as(binCol), col("iso"))
  }
}
