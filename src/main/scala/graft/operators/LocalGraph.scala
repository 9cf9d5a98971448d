package graft.operators

import scala.collection.mutable

/** Driver-local exact graph solvers behind a cost-based size gate.
  *
  * The iterative graph operators ([[Components]], [[KCore]],
  * [[PageRank]], [[Bfs]]) pay per-round DISTRIBUTED overhead: each
  * round is 1-3 shuffles plus an eager `localCheckpoint`, so a
  * 10-round peel on a 3 000-edge graph costs ~30 tiny Spark jobs —
  * seconds of scheduling for microseconds of actual work. That is the
  * same trade Spark's own planner makes with broadcast joins: below a
  * size threshold, shipping the data to one place and using a local
  * algorithm beats the distributed formulation. Each operator
  * therefore takes `maxLocalEdges` (default
  * [[LocalGraph.DefaultMaxLocalEdges]]): when the MATERIALIZED edge
  * count (already produced by the operator's first checkpoint —
  * deciding is free) is at or below the gate, the edges are collected
  * and solved here; above it, the unchanged distributed path runs.
  * Pass 0 to force the distributed path (the scale stress tests do).
  *
  * Every local solver is EXACT and reproduces the distributed
  * arithmetic bit-for-bit (integer PageRank sums are order-free;
  * CC/k-core/BFS results are order-free sets), so the fallback is
  * invisible to oracles — GraphOpsSpec pins local == distributed on
  * the same inputs.
  *
  * 100 TB note: 1M edges ≈ 16 MB collected — the same order as a
  * broadcast side. The gate compares EDGE COUNT, which the operators
  * have already counted for convergence bookkeeping, so the big-graph
  * path never pays an extra pass.
  */
object LocalGraph {

  /** Edge-count gate under which iterative operators solve locally. */
  val DefaultMaxLocalEdges: Long = 1000000L

  /** Union-find connected components: (node, min node id reachable).
    * Path-halving + union-by-label-min keeps the forest rooted at each
    * component's minimum id, which IS the distributed fixpoint label.
    */
  def components(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) { // root at the smaller id → label = component min
        if (ru < rv) parent.update(rv, ru) else parent.update(ru, rv)
      }
    }
    parent.keys.toArray.map(n => (n, find(n))).sortBy(_._1)
  }

  /** k-core by repeated peeling: (node, induced degree in the k-core).
    * Uses a worklist instead of whole-graph rounds — same fixpoint as
    * the distributed peel (deletion order never changes the k-core).
    */
  def kCore(edges: Array[(Long, Long)], k: Int): Array[(Long, Long)] = {
    val canon = edges.iterator
      .filter { case (u, v) => u != v }
      .map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .toArray.distinct
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    def add(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty[Long]) += b
    canon.foreach { case (u, v) => add(u, v); add(v, u) }
    val deg = mutable.LongMap.empty[Long]
    adj.foreach { case (n, ns) => deg.update(n, ns.length.toLong) }
    val queue = mutable.Queue.empty[Long]
    adj.keys.foreach(n => if (deg(n) < k) queue.enqueue(n))
    val dead = mutable.LongMap.empty[Boolean]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (!dead.getOrElse(n, false) && deg(n) < k) {
        dead.update(n, true)
        adj(n).foreach { m =>
          if (!dead.getOrElse(m, false)) {
            val d = deg(m) - 1
            deg.update(m, d)
            if (d < k) queue.enqueue(m)
          }
        }
      }
    }
    adj.keys.toArray.filter(n => !dead.getOrElse(n, false))
      .map { n =>
        val d = adj(n).count(m => !dead.getOrElse(m, false)).toLong
        (n, d)
      }
      .filter(_._2 > 0) // matches distributed: nodes come from surviving edges
      .sortBy(_._1)
  }

  /** Integer PageRank — the identical fixed-point recurrence as
    * [[PageRank.run]] (rank div outdeg contribs, (100-d)/100 base,
    * d·Σ div 100 update). Long sums are associative-exact, so this is
    * bit-identical to the distributed reduction in any order.
    */
  def pageRank(
      edges: Array[(Long, Long)],
      nodes: Array[Long],
      iterations: Int,
      scale: Long,
      dampingX100: Long,
      seeds: Option[scala.collection.Set[Long]] = None): Array[(Long, Long)] = {
    val outdeg = mutable.LongMap.empty[Long]
    edges.foreach { case (s, _) => outdeg.update(s, outdeg.getOrElse(s, 0L) + 1L) }
    // Personalized form (PageRank.run teleportSeeds): rank_0 and the
    // base term are masked to the seed set — same integer arithmetic
    // as the distributed path's __s multiplier.
    @inline def seeded(n: Long): Boolean = seeds.forall(_.contains(n))
    val base = scale * (100L - dampingX100) / 100L
    var ranks = mutable.LongMap.empty[Long]
    nodes.foreach(n => ranks.update(n, if (seeded(n)) scale else 0L))
    var i = 0
    while (i < iterations) {
      val in = mutable.LongMap.empty[Long]
      edges.foreach { case (s, d) =>
        // contribs flow only from nodes in the rank table, exactly as
        // the distributed join drops edges whose src isn't ranked
        ranks.get(s).foreach { r =>
          in.update(d, in.getOrElse(d, 0L) + r / outdeg(s))
        }
      }
      val next = mutable.LongMap.empty[Long]
      nodes.foreach { n =>
        next.update(n, (if (seeded(n)) base else 0L) +
          in.getOrElse(n, 0L) * dampingX100 / 100L)
      }
      ranks = next
      i += 1
    }
    nodes.map(n => (n, ranks(n))).sortBy(_._1)
  }

  /** Synchronous deterministic label propagation — the identical
    * recurrence as [[LabelProp.run]]: every node simultaneously adopts
    * its neighbors' plurality label from the PREVIOUS round, plurality
    * ties toward the smallest label. Argmax over (count, -label) is
    * order-free, so this matches the distributed reduction exactly.
    */
  def labelProp(edges: Array[(Long, Long)], rounds: Int): Array[(Long, Long)] = {
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    def add(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty[Long]) += b
    edges.foreach { case (u, v) => if (u != v) { add(u, v); add(v, u) } }
    var labels = mutable.LongMap.empty[Long]
    adj.keys.foreach(n => labels.update(n, n))
    var i = 0
    while (i < rounds) {
      val next = mutable.LongMap.empty[Long]
      adj.foreach { case (n, ns) =>
        val counts = mutable.LongMap.empty[Long]
        ns.foreach { m =>
          val l = labels(m)
          counts.update(l, counts.getOrElse(l, 0L) + 1L)
        }
        var bestL = Long.MaxValue; var bestC = 0L
        counts.foreach { case (l, c) =>
          if (c > bestC || (c == bestC && l < bestL)) { bestC = c; bestL = l }
        }
        next.update(n, bestL)
      }
      labels = next
      i += 1
    }
    adj.keys.toArray.map(n => (n, labels(n))).sortBy(_._1)
  }

  /** Multi-source BFS hop distances, capped at `maxRounds` hops —
    * the same frontier recurrence as the distributed form: dist 0 at
    * every seed, each round extends the frontier one hop, first
    * arrival is final (unit weights). Unreached nodes are absent.
    */
  def bfs(
      edges: Array[(Long, Long)],
      seeds: Array[Long],
      maxRounds: Int): Array[(Long, Long)] = {
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    def add(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty[Long]) += b
    edges.foreach { case (u, v) => if (u != v) { add(u, v); add(v, u) } }
    val dist = mutable.LongMap.empty[Long]
    var frontier = seeds.distinct
    frontier.foreach(s => dist.update(s, 0L)) // seeds keep dist 0 even if isolated
    var round = 0
    while (round < maxRounds && frontier.nonEmpty) {
      val next = mutable.ArrayBuffer.empty[Long]
      frontier.foreach { n =>
        adj.getOrElse(n, mutable.ArrayBuffer.empty[Long]).foreach { m =>
          if (!dist.contains(m)) { dist.update(m, round + 1L); next += m }
        }
      }
      frontier = next.toArray
      round += 1
    }
    dist.toArray.sortBy(_._1)
  }

  /** Driver-local k-round synchronous Bellman-Ford over weighted
    * undirected edges (parallel edges collapse to min weight, as the
    * distributed form does). SYNCHRONOUS is load-bearing: each round
    * relaxes from the PREVIOUS round's distances (double-buffered),
    * so after k rounds the map holds exactly min weight over ≤k-edge
    * paths — in-place relaxation would converge faster and diverge
    * from [[Bfs.weightedDistances]]'s round-bounded contract.
    */
  def bellmanFord(
      edges: Array[(Long, Long, Long)],
      seeds: Array[Long],
      rounds: Int): Array[(Long, Long)] = {
    val w = mutable.HashMap.empty[(Long, Long), Long]
    edges.foreach { case (u, v, c) =>
      if (u != v) {
        val ka = (u, v); val kb = (v, u)
        w.update(ka, math.min(c, w.getOrElse(ka, Long.MaxValue)))
        w.update(kb, math.min(c, w.getOrElse(kb, Long.MaxValue)))
      }
    }
    var dist = mutable.LongMap.empty[Long]
    seeds.distinct.foreach(s => dist.update(s, 0L))
    var r = 0
    while (r < rounds) {
      val next = dist.clone()
      w.foreach { case ((s, d), c) =>
        dist.get(s).foreach { ds =>
          if (next.getOrElse(d, Long.MaxValue) > ds + c) next.update(d, ds + c)
        }
      }
      dist = next
      r += 1
    }
    dist.toArray.sortBy(_._1)
  }
}
