package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance — the fifth graph pillar (after
  * PageRank, connected components, triangle census, k-core): distance
  * from every node to its NEAREST seed, the primitive behind
  * "hops to the closest hub/distribution center/moderator" features
  * and graph-radius diagnostics.
  *
  * Algorithm: synchronous frontier expansion. dist 0 at every seed;
  * each round joins the current frontier to the symmetrized edge list
  * and anti-joins already-settled nodes — with unit weights, first
  * arrival IS the shortest distance, so settled nodes are final and
  * the per-round state is only (node, dist). Each round is one
  * equi-join + one anti-join, both hash-shuffles on node id; rounds
  * stop at the fixpoint (empty frontier) or `maxRounds`, whichever
  * comes first — running past the fixpoint is a no-op, which is what
  * lets a fixed-round external oracle reproduce the result exactly.
  *
  * Scale: per-round cost is |frontier ⋈ edges|, total Σ = |E| touched
  * once per direction over the whole traversal (each settled node's
  * edges fire exactly once) — the textbook O(E) BFS, spread over
  * diameter-many rounds. `localCheckpoint` truncates per-round
  * lineage as in [[Components]]. Tiny graphs skip all of it via the
  * [[LocalGraph]] cost gate.
  */
object Bfs {

  /** @param edges     undirected edge list
    * @param seeds     one-column frame of seed node ids (dist 0)
    * @param maxRounds hop cap; results are exact iff every reachable
    *                  node is within this many hops of a seed (extra
    *                  rounds past the fixpoint are no-ops)
    * @param maxLocalEdges [[LocalGraph]] cost gate; 0 forces the
    *                  distributed path
    * @return (node, dist): every node within maxRounds hops of a
    *         seed; unreached nodes are absent
    */
  def hops(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      seeds: DataFrame,
      maxRounds: Int,
      maxLocalEdges: Long = LocalGraph.DefaultMaxLocalEdges): DataFrame = {
    val e = edges.select(col(uCol).cast("long").as("s"), col(vCol).cast("long").as("d"))
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .distinct()
      .localCheckpoint(true)
    val seedNodes = seeds.select(col(seeds.columns.head).cast("long").as("node")).distinct()

    if (maxLocalEdges > 0 && sym.count() <= 2 * maxLocalEdges) {
      val local = LocalGraph.bfs(
        sym.filter(col("s") < col("d")).collect().map(r => (r.getLong(0), r.getLong(1))),
        seedNodes.collect().map(_.getLong(0)),
        maxRounds)
      val spark = edges.sparkSession
      import spark.implicits._
      return local.toSeq.toDF("node", "dist")
    }

    var dist = seedNodes.select(col("node"), lit(0L).as("dist")).localCheckpoint(true)
    var frontier = dist
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val cand = sym.join(frontier.select(col("node").as("s")), "s")
        .select(col("d").as("node")).distinct()
      val fresh = cand.join(dist.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(round + 1L).as("dist"))
        .localCheckpoint(true)
      done = fresh.isEmpty
      if (!done) {
        dist = dist.union(fresh).localCheckpoint(true)
        frontier = fresh
      }
      round += 1
    }
    dist
  }

  /** Weighted single/multi-source shortest distances: `rounds` rounds
    * of synchronous Bellman-Ford relaxation (min-plus). After k rounds
    * the frame holds EXACTLY min path weight over all ≤k-edge paths —
    * that closed form is what lets a bounded-depth recursive-CTE
    * oracle reproduce the result to the integer, and it is the honest
    * semantics for hub-distance features (cap the hop horizon, not the
    * graph). Unlike unit-weight BFS, settled nodes may improve in
    * later rounds, so every round re-minimizes the full (node, dist)
    * frame: one equi-join + one map-side-combined min-agg per round,
    * lineage truncated per round exactly as [[hops]] does. Parallel
    * edges collapse to their min weight up front.
    */
  def weightedDistances(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      wCol: String,
      seeds: DataFrame,
      rounds: Int,
      maxLocalEdges: Long = LocalGraph.DefaultMaxLocalEdges): DataFrame = {
    val e = edges.select(col(uCol).cast("long").as("s"), col(vCol).cast("long").as("d"),
      col(wCol).cast("long").as("w"))
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d"), col("w")))
      .filter(col("s") =!= col("d"))
      .groupBy("s", "d").agg(min("w").as("w"))
      .localCheckpoint(true)

    if (maxLocalEdges > 0 && sym.count() <= 2 * maxLocalEdges) {
      val local = LocalGraph.bellmanFord(
        sym.filter(col("s") < col("d")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
        seeds.select(col(seeds.columns.head).cast("long")).distinct()
          .collect().map(_.getLong(0)),
        rounds)
      val spark = edges.sparkSession
      import spark.implicits._
      return local.toSeq.toDF("node", "dist")
    }
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("node"),
      lit(0L).as("dist")).distinct().localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = sym.join(dist.select(col("node").as("s"), col("dist")), "s")
        .select(col("d").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }
}
