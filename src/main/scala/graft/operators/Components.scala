package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge set — the near-dup "endgame":
  * pair detection (MinHash/LSH, SimHash, embedding-threshold) yields
  * EDGES, but dedup needs CLUSTERS (keep one canonical doc per
  * transitive group; A~B and B~C must collapse even when A~C was
  * never emitted as a pair).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own label and its neighbors' labels; fixpoint = component = the
  * minimum id reachable from the node. Each round is one shuffle
  * (edge⋈label join) + one partial+final min aggregation — no driver
  * data beyond a per-round convergence scalar.
  *
  * Scale notes (100 TB design point):
  *  - rounds needed = graph diameter. Near-dup graphs are
  *    overwhelmingly tiny cliques/short chains (dup clusters), so
  *    convergence is typically 2–4 rounds. For adversarial
  *    long-diameter graphs the drop-in refinement is alternating
  *    large-star/small-star (Kiveris et al., "Connected Components in
  *    MapReduce and Beyond", SoCC '14) which bounds rounds by
  *    O(log² n); the per-round dataflow (join + min-agg) is the same
  *    shape as here.
  *  - convergence is detected via sum(label): labels only ever
  *    decrease, so an unchanged sum IS the fixpoint — one Long to the
  *    driver per round, never the labels themselves.
  *  - `localCheckpoint` truncates the per-round lineage so the plan
  *    doesn't grow unboundedly (the standard iterative-algorithm
  *    pattern; without it round k replays rounds 1..k-1).
  */
object Components {

  /** @param edges     undirected edge list (any extra columns ignored)
    * @param srcCol    edge endpoint column a
    * @param dstCol    edge endpoint column b
    * @param maxIter   safety bound on propagation rounds
    * @return (id, component) for every node appearing in any edge;
    *         component = min node id of the connected component.
    *         Isolated nodes (no edges) are the caller's to union in —
    *         their component is trivially their own id.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    // Symmetrize once so one join direction propagates both ways.
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var prevSum = labels.agg(sum("component")).head.getLong(0)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = sym.join(labels, sym("s") === labels("id"))
        .select(col("d").as("id"), col("component"))
      val next = msgs.union(labels)
        .groupBy("id")
        .agg(min("component").as("component"))
        .localCheckpoint(true)
      val nextSum = next.agg(sum("component")).head.getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels
  }
}
