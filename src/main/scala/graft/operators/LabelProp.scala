package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) — the sixth
  * graph pillar (after PageRank, connected components, triangle
  * census, k-core, BFS). Unlike connected components (which merges
  * everything reachable), LPA finds DENSE regions: each node
  * repeatedly adopts the label carried by the plurality of its
  * neighbors, so labels flood dense subgraphs quickly but penetrate
  * sparse bridges slowly — after a fixed number of rounds, bridged
  * cliques keep distinct labels while each clique agrees internally.
  *
  * Classic LPA breaks plurality ties randomly, which is untestable
  * against an external oracle; this variant is DETERMINISTIC: the new
  * label is the neighbor label with the highest count, ties broken
  * toward the SMALLEST label, and every node updates simultaneously
  * from the previous round's labels (synchronous rounds, not the
  * asynchronous sweep). Fixed `rounds` + deterministic tie-break means
  * an unrolled SQL oracle reproduces the result bit-for-bit (q166).
  *
  * Scale shape: per round, one hash join labels⋈edges on the node id
  * and one two-level aggregation — count by (node, label), then
  * argmax by node (`max_by` over a (count, -label) struct, an
  * order-free associative reduction). Per-round state is |V| rows;
  * `localCheckpoint` truncates per-round lineage exactly as in
  * [[Components]]. Tiny graphs route through the [[LocalGraph]] cost
  * gate instead of paying ~2 shuffles x rounds of scheduling.
  */
object LabelProp {

  /** @param edges  undirected edge list (each pair once, either
    *               orientation); integral node ids
    * @param rounds synchronous update rounds (>= 0; 0 returns the
    *               init labels = node ids)
    * @param maxLocalEdges [[LocalGraph]] cost gate; 0 forces the
    *               distributed path
    * @return (node, label): every non-isolated node with its
    *         community label after `rounds` rounds
    */
  def run(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      rounds: Int,
      maxLocalEdges: Long = LocalGraph.DefaultMaxLocalEdges): DataFrame = {
    val e = edges.select(col(uCol).cast("long").as("s"), col(vCol).cast("long").as("d"))
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .localCheckpoint(true)

    if (maxLocalEdges > 0 && sym.count() <= 2 * maxLocalEdges) {
      val local = LocalGraph.labelProp(
        sym.filter(col("s") < col("d")).collect().map(r => (r.getLong(0), r.getLong(1))),
        rounds)
      val spark = edges.sparkSession
      import spark.implicits._
      return local.toSeq.toDF("node", "label")
    }

    // Every node in sym has >= 1 neighbor (self-loops dropped), so the
    // per-round argmax covers the full node set — no isolated-node
    // left-join patch needed.
    var labels = sym.select(col("s").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      labels = sym
        .join(labels.select(col("node").as("s"), col("label")), "s")
        .select(col("d").as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(max_by(col("label"), struct(col("c"), -col("label"))).as("label"))
        .localCheckpoint(true)
      i += 1
    }
    labels
  }
}
