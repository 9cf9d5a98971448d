package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the fourth graph
  * pillar (after PageRank, connected components, triangle census).
  * The k-core is the maximal induced subgraph where every node has
  * degree >= k: the standard dense-substructure filter (spam rings,
  * tightly-coupled product clusters, community nuclei) and the usual
  * preprocessing cut before more expensive per-subgraph analytics.
  *
  * Algorithm: repeatedly delete nodes of degree < k until none remain
  * (the classic peeling fixpoint; the order of deletions never changes
  * the result, so a whole round can drop in parallel). Each round is
  * one degree aggregation + two equi-joins back onto the edge list —
  * all hash-shuffles on node ids, no driver data beyond the per-round
  * edge-count convergence scalar. `localCheckpoint` truncates the
  * per-round lineage exactly as in [[Components]]; rounds are bounded
  * by the graph's degeneracy ordering depth (typically small), with a
  * `maxIter` safety bound.
  */
object KCore {

  /** @param edges  undirected edge list; canonicalized (self-loops
    *               dropped, u<v, distinct) before peeling
    * @param k      minimum in-core degree
    * @param strict true → throw if maxIter rounds don't converge;
    *               false → return the partial peel (a SUPERSET of the
    *               true k-core — more rounds only remove nodes)
    * @return (node, core_deg): the k-core's nodes with their induced
    *         degree; empty when the k-core is empty.
    */
  def kCore(edges: DataFrame, uCol: String, vCol: String, k: Int,
      maxIter: Int = 50, strict: Boolean = true,
      maxLocalEdges: Long = LocalGraph.DefaultMaxLocalEdges): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = edges
      .filter(col(uCol) =!= col(vCol))
      .select(
        least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .distinct()
      .localCheckpoint(true)
    var prevCount = e.count()
    // Cost-based gate (see LocalGraph): the canonical edge set is
    // already materialized and counted, so deciding is free. A peel
    // that would run 10 rounds × (1 agg + 2 joins + checkpoint) on a
    // few thousand edges instead runs a worklist in microseconds.
    if (maxLocalEdges > 0 && prevCount <= maxLocalEdges) {
      val local = LocalGraph.kCore(
        e.collect().map(r => (r.getLong(0), r.getLong(1))), k)
      val spark = edges.sparkSession
      import spark.implicits._
      return local.toSeq.toDF("node", "core_deg")
    }
    var iter = 0
    var converged = prevCount == 0L
    while (iter < maxIter && !converged) {
      val deg = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("node"))
      val e2 = e
        .join(keep.select(col("node").as("u")), "u")
        .join(keep.select(col("node").as("v")), "v")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val c = e2.count()
      e = e2
      // edge count is monotone non-increasing; unchanged == fixpoint
      converged = c == prevCount || c == 0L
      prevCount = c
      iter += 1
    }
    if (strict) require(converged, s"k-core peeling did not converge in $maxIter rounds")
    e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
  }
}
