package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via degree-ordered orientation.
  *
  * Input: an undirected edge set in canonical form (u < v, distinct).
  * Each edge is oriented from its lower-degree endpoint (ties: lower
  * id), producing a DAG whose max out-degree is O(sqrt(m)) regardless
  * of how skewed the raw degree distribution is — a hub of degree d
  * keeps its d incident edges, but at most O(sqrt(m)) point AWAY from
  * it, so the wedge enumeration below never materializes a hub's d^2
  * neighbor pairs. That bound is what makes this the standard
  * cluster-scale triangle algorithm (three hash-shuffles, no state
  * beyond the edge list).
  *
  * Every triangle has exactly one vertex with out-degree 2 inside it
  * (the DAG orientation of a 3-cycle is acyclic, hence has a unique
  * source), so enumerating unordered out-neighbor pairs (wedges) and
  * closing them against the canonical edge set counts each triangle
  * exactly once — no /3 correction, no double counting.
  */
object Triangles {

  /** 1-row global census: triangles, wedge total (sum C(d,2) — open +
    * closed), node and edge counts, and the global clustering
    * coefficient 3*tri/wedges. `edges` must be canonical (u<v,
    * distinct); compute guards cheaply rather than trusting callers.
    */
  def census(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val pairs = edges
      .filter(col(uCol) =!= col(vCol))
      .select(
        least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .distinct()
    val deg = pairs.select(col("u").as("node"))
      .union(pairs.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = pairs
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"))
    // unordered out-neighbor pairs of each pivot; x<y aligns with the
    // canonical edge set so the closing join needs no least/greatest
    val wedges = oriented.select(col("s"), col("t").as("x"))
      .join(oriented.select(col("s"), col("t").as("y")), "s")
      .filter(col("x") < col("y"))
    val tri = wedges
      .join(pairs, wedges("x") === pairs("u") && wedges("y") === pairs("v"))
      .agg(count(lit(1)).as("n_triangles"))
    // d*(d-1) is even, so the /2 is exact in double well past any real
    // degree sum; oracle side casts the same way (/2 then ::BIGINT)
    val wtot = deg.agg((sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = pairs.agg(count(lit(1)).as("n_edges"))
    tri.crossJoin(wtot).crossJoin(nodes).crossJoin(nEdges)
      .select(col("n_triangles"), col("n_wedges"), col("n_nodes"), col("n_edges"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4).as("clustering_coeff"))
  }
}
