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
    *
    * Cache contract: the canonical edge set and the oriented DAG are
    * `persist()`-marked here (lazily — no job runs at plan time)
    * because the census consumes each 3+ times (degree agg, wedge
    * self-join branches, closing join, edge count); without the marks
    * the upstream edge-derivation lineage re-executes per consumer.
    * Callers that keep the session long-lived should release them via
    * `spark.catalog.clearCache()` (or unpersist the handles) after
    * materializing the result, as Bench/Verify hygiene does.
    *
    * `broadcastClose` (default true): the closing probe checks each
    * wedge (x,y) against the canonical EDGE list — the small side of
    * this algorithm by construction (wedges ~ sum C(outdeg,2) dwarf
    * edges m; at sf0.1's part graph 41M wedges vs 1.2M edges).
    * Broadcasting the edge list closes wedges in the SAME stage that
    * enumerates them — the 41M-row wedge set is never serialized
    * through a shuffle (12.9 s → ~2 s at sf0.1). Edges are the
    * broadcast-bounded axis: a graph whose edge list outgrows executor
    * memory (multi-TB) flips this to false and pays the wedge shuffle
    * into a sort-merge close instead — same plan shape the
    * GraphOpsSpec differential pins to identical counts.
    */
  def census(edges: DataFrame, uCol: String, vCol: String,
      broadcastClose: Boolean = true): DataFrame = {
    val (pairs, deg, closed) = closedTriangles(edges, uCol, vCol, broadcastClose)
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    // d*(d-1) is even, so the /2 is exact in double well past any real
    // degree sum; oracle side casts the same way (/2 then ::BIGINT)
    val wtot = deg.agg((sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = pairs.agg(count(lit(1)).as("n_edges"))
    tri.crossJoin(wtot).crossJoin(nodes).crossJoin(nEdges)
      .select(col("n_triangles"), col("n_wedges"), col("n_nodes"), col("n_edges"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4).as("clustering_coeff"))
  }

  /** Per-node local clustering coefficient: lcc(v) = 2·tri(v)/(d(d−1)),
    * the node-grain refinement of census's single global number. Every
    * closed triangle (s,x,y) credits all three corners — one explode
    * over the (much smaller than wedges) triangle set, then a
    * node-sized left join back onto the degree table so triangle-free
    * nodes report exactly 0. Cost is identical to census (the same
    * oriented enumeration); only the final aggregation differs.
    * `minDeg` drops the degenerate d<2 nodes (lcc undefined) and the
    * noise floor callers don't want ranked.
    */
  def perNode(edges: DataFrame, uCol: String, vCol: String,
      minDeg: Int = 2, broadcastClose: Boolean = true): DataFrame = {
    val (_, deg, closed) = closedTriangles(edges, uCol, vCol, broadcastClose)
    val perCorner = closed
      .select(explode(array(col("s"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.filter(col("d") >= minDeg)
      .join(perCorner, Seq("node"), "left")
      .select(col("node"), col("d"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) / (col("d") * (col("d") - 1)), 4)
          .as("lcc"))
  }

  /** Shared enumeration core: canonicalized edge set, degree table, and
    * the closed-triangle frame (s, x, y) with s the unique DAG source
    * and x < y the closing edge. See census's scaladoc for the
    * orientation bound and cache contract.
    */
  private def closedTriangles(edges: DataFrame, uCol: String, vCol: String,
      broadcastClose: Boolean): (DataFrame, DataFrame, DataFrame) = {
    val pairs = edges
      .filter(col(uCol) =!= col(vCol))
      .select(
        least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .distinct()
      .persist()
    // n-row degree table, consumed 4x (two orientation joins, wedge
    // total, node count) — persisted, and broadcast into the
    // orientation joins under the same small-side assumption as the
    // close (nodes n <= edges m, so edge-broadcast implies this; the
    // shuffle form remains for beyond-memory graphs). Without the hint
    // the union's pre-agg shuffle stats (2m rows) overshoot AQE's
    // threshold and the orientation pays two avoidable SMJ shuffles
    // of the full edge set.
    val deg = pairs.select(col("u").as("node"))
      .union(pairs.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
      .persist()
    def degAs(k: String, d: String) = {
      val t = deg.select(col("node").as(k), col("d").as(d))
      if (broadcastClose) broadcast(t) else t
    }
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = pairs
      .join(degAs("u", "du"), "u")
      .join(degAs("v", "dv"), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"))
      .persist() // consumed twice by the wedge self-join branches
    // unordered out-neighbor pairs of each pivot; x<y aligns with the
    // canonical edge set so the closing join needs no least/greatest.
    // The self-join's INPUT is tiny (m rows) but its OUTPUT is the
    // wedge set (sum C(outdeg,2) — 34x bigger at sf0.1), so AQE's
    // input-byte-sized coalescing would run the whole enumeration in
    // ONE task; an explicit-count repartition on the pivot key is
    // honored by AQE and keeps the fan-out stage at full parallelism.
    val nPart = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val byPivot = oriented.repartition(nPart, col("s"))
    val wedges = byPivot.select(col("s"), col("t").as("x"))
      .join(byPivot.select(col("s"), col("t").as("y")), "s")
      .filter(col("x") < col("y"))
    // Broadcast close probes on ONE long key — xxhash64(u,v) — instead
    // of the (u,v) composite: a single LongType key takes Spark's
    // LongHashedRelation primitive-map fast path (no per-probe
    // UnsafeRow allocation or 16-byte murmur), 2.4x faster over the
    // 41M-probe wedge stream at sf0.1. Hash collisions are made exact
    // by the (cu,cv) residual; it is spelled `between(cu, cu)` rather
    // than `=== cu` deliberately — an equality would be re-extracted
    // by the planner into the join key, silently restoring the
    // composite-key slow path, while the range form stays a residual
    // filter on the probe hit.
    val closed = (if (broadcastClose) {
      val cl = broadcast(pairs.select(xxhash64(col("u"), col("v")).as("hk"),
        col("u").as("cu"), col("v").as("cv")))
      wedges.join(cl, xxhash64(col("x"), col("y")) === col("hk") &&
        col("x").between(col("cu"), col("cu")) &&
        col("y").between(col("cv"), col("cv")))
    } else {
      wedges.join(pairs.select(col("u").as("cu"), col("v").as("cv")),
        col("x") === col("cu") && col("y") === col("cv"))
    }).select(col("s"), col("x"), col("y"))
    (pairs, deg, closed)
  }
}
