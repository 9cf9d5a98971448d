package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the PPJoin
  * family — Chaudhuri et al. ICDE'06 SSJoin, Xiao et al. WWW'08; public
  * algorithms). Finds every pair of rows whose element sets have
  * Jaccard similarity >= theta, WITHOUT an all-pairs comparison and
  * WITHOUT probabilistic signatures (contrast `Dedup.minhashLshPairs`,
  * which trades exactness for fewer candidates; this operator is its
  * deterministic-exact complement — same spec, different machinery).
  *
  * Why it scales: two sets with Jaccard >= theta MUST share at least
  * one element among the first `n - ceil(theta*n) + 1` elements of
  * each, once both are sorted by one global total order (if the
  * prefixes were disjoint, the overlap is at most the suffix length
  * ceil(theta*n) - 1 on either side, which is below the
  * theta/(1+theta) * (na+nb) overlap the threshold demands). So only
  * rows sharing a PREFIX element are candidates. Ordering rarest-first
  * makes prefixes carry the least-frequent elements, collapsing the
  * candidate count: the join fan-out per element is df^2 over only the
  * rare tail, not the stop-word head.
  *
  * Shuffle shape at 100 TB: one groupBy per doc (set build), one
  * element-frequency aggregation, one equi-join keyed on prefix
  * elements, one verify join keyed on pair ids — every stage is
  * hash-partitioned on a real key; no global window, no driver state,
  * no cartesian product. The global element order needs NO global sort:
  * each row sorts its own array by the (df, element) tuple, which is a
  * total order computable locally once df is joined in.
  */
object SetSimJoin {

  /** @param docs   input with an id column and an array<string> set column
    *               (duplicates in the array are collapsed — set semantics)
    * @param theta  Jaccard threshold in (0, 1]
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4
    */
  def prefixJaccardSelfJoin(
      docs: DataFrame,
      idCol: String,
      setCol: String,
      theta: Double): DataFrame = {
    require(theta > 0 && theta <= 1, "theta in (0, 1]")
    // Set-ify: distinct (id, element) pairs; global document frequency.
    val pairs = docs
      .select(col(idCol).as("id"), explode(col(setCol)).as("el"))
      .distinct()
    val freq = pairs.groupBy("el").agg(count(lit(1)).as("df"))
    // Per doc: elements sorted rarest-first under the (df, el) total
    // order. sort_array on the struct gives the order locally — the
    // "global ordering" costs one equi-join, not a global sort.
    val sorted = pairs.join(freq, "el")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("el")))).as("se"))
      .select(
        col("id"),
        transform(col("se"), x => x("el")).as("els"),
        size(col("se")).as("n"))
    val withPre = sorted.withColumn(
      "plen", (col("n") - ceil(lit(theta) * col("n")) + 1).cast("int"))
    val pre = withPre.select(
      col("id"), explode(slice(col("els"), lit(1), col("plen"))).as("el"))
    // Candidates: any pair sharing a prefix element, ordered, deduped.
    val cand = pre.as("a")
      .join(pre.as("b"), col("a.el") === col("b.el") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Verify: exact Jaccard on the full element arrays.
    val sets = withPre.select(col("id"), col("els"))
    cand
      .join(sets.toDF("id_a", "ea"), "id_a")
      .join(sets.toDF("id_b", "eb"), "id_b")
      .withColumn("inter", size(array_intersect(col("ea"), col("eb"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("ea")) + size(col("eb")) - col("inter")))
      .filter(col("jaccard") >= theta)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
