package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: graph pillar — pagerank/components/k-core/BFS/SSSP/HITS/triangles and co-occurrence structure.
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesGraph { this: Queries.type =>

  /** Near-dup CLUSTERING — the dedup endgame: pair detection (q23)
    * yields edges, but keep-one-per-group needs the transitive
    * closure (A~B, B~C collapse together even when A~C never met an
    * LSH band). Connected components via iterative min-label
    * propagation (operators/Components); the oracle is DuckDB's
    * recursive-CTE transitive closure over the exact-Jaccard pair
    * graph (identical to the LSH pairs at this threshold — q23's
    * proven separation).
    */
  def q53_dedup_components(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Components
    val pairs = lshPairsStaged(s, dir)
    Components.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"),
        (col("id") === col("component")).cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Term co-occurrence counts — the PMI / embedding-training prep
    * pass. Pairs are generated MAP-SIDE from each doc's sorted distinct
    * word array (w_a < w_b falls out of the sort), so the only
    * shuffle in the job is the partial+final count on the pair key —
    * the self-join formulation pays three more (a distinct on
    * (doc, word) plus re-keying both join sides on doc_id) to build
    * the same pairs. Pair blowup is |doc|·v²/2 with v = per-doc
    * DISTINCT vocabulary either way, which quality-gated corpora keep
    * small; it is generated-then-aggregated inside one codegen stage
    * here, never materialized through an exchange. Top-k tail is
    * TakeOrderedAndProject, never a global sort.
    */
  def q75_cooccurrence(s: SparkSession, dir: String): DataFrame = {
    val ws = sort_array(array_distinct(
      filter(split(col("text"), " "), w => length(w) > 0)))
    tWide(s, dir, "documents")
      .select(ws.as("ws"))
      .select(explode(flatten(transform(col("ws"), (x, i) =>
        transform(slice(col("ws"), i + lit(2), size(col("ws"))),
          y => struct(x.as("w_a"), y.as("w_b")))))).as("p"))
      .groupBy(col("p.w_a").as("w_a"), col("p.w_b").as("w_b"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(desc("n_docs"), col("w_a"), col("w_b"))
      .limit(25)
  }

  /** Inverted-index build: per term, document frequency + the first 10
    * postings. The WindowGroupLimit-pruned row_number (rank ≤ 10 per
    * term, discarded partition-local before the sort finishes) BOUNDS
    * the collect_list state — the naive collect-then-slice holds a
    * term's whole posting list in one aggregation buffer, which for a
    * stopword at 100 TB is the corpus. df rides the same shuffled
    * `words` via a separate count agg, joined back on the term.
    */
  def q76_posting_lists(s: SparkSession, dir: String): DataFrame = {
    // Per-doc word dedup is array_distinct — a map, not the shuffle a
    // global distinct() over (doc_id, w) would cost (they are the same
    // set: distinct-per-key IS per-row distinct here).
    val words = tWide(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(filter(split(col("text"), " "),
          w => length(w) > 0))).as("w"))
    // df stays a SEPARATE aggregate (map-side combine shrinks it to
    // |vocab| rows per partition) rather than a count window fused
    // into the ranking pass: an exact count window would need every
    // row and so would forfeit WindowGroupLimit's partition-local
    // prune, which is what keeps the ranking shuffle at ≤10 rows per
    // term per partition — the property that matters for a stopword
    // at 100 TB.
    val dfreq = words.groupBy("w").agg(count(lit(1)).as("df"))
    val rankW = Window.partitionBy("w").orderBy("doc_id")
    val top = words
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= 10)
      .groupBy("w")
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
    dfreq.join(top, Seq("w"))
      .select(col("w").as("word"), col("df"), col("postings"))
      .orderBy("word")
  }

  /** PageRank over the word co-occurrence graph (top-30 document
    * terms) — iterative distributed graph compute in exact fixed-point
    * arithmetic via `operators/PageRank.scala`: 3 power-iteration
    * rounds, each ONE ranks⋈edges hash join plus ONE groupBy(dst)
    * shuffle (the irreducible communication of power iteration).
    * Integer ranks make the result bit-identical to the oracle's
    * unrolled-CTE evaluation — float PageRank cannot be
    * oracle-checked at all. Companion iterative operator to
    * q53's connected components.
    */
  def q131_pagerank(s: SparkSession, dir: String): DataFrame = {
    // Per-doc dedup happens ROW-LOCALLY (array_distinct before the
    // explode) — the (doc, word) stream is already distinct, so no
    // global distinct() shuffle of the exploded rows is needed.
    // r13 optimization: the tokenize+explode pass over the corpus was
    // re-executed by every consumer (top-word agg, BOTH sides of the
    // co-occurrence self-join, and the node universe) — 4 full scans.
    // Persisting the tiny 30-row top list and the top-filtered (doc,
    // word) frame (≤30 rows/doc at any corpus size) cuts that to one
    // tokenize pass + cache reads; results are bit-identical.
    val toks = tWide(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(filter(split(lower(col("text")), "[^a-z]+"),
          w => length(w) >= 4))).as("w"))
    val top = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(30).select("w")
      .persistTracked()
    val kept = toks.join(broadcast(top), "w").persistTracked()
    val edges = kept.select(col("doc_id"), col("w").as("src"))
      .join(kept.select(col("doc_id"), col("w").as("dst")), "doc_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    // The node universe is the top-k list itself, passed explicitly so
    // a top word with NO co-occurrence edge still gets its base rank —
    // the oracle seeds r0..r3 from `top`, so deriving nodes from the
    // edge list would silently drop such a word on this side only.
    operators.PageRank.run(edges, iterations = 3,
        nodeUniverse = Some(top.select(col("w").as("node"))))
      .select(col("node"), col("rank").as("pr"))
      .orderBy(desc("pr"), col("node"))
  }

  /** Graph analytics third pillar (after PageRank q131 and connected
    * components q53): exact triangle counting over the part
    * co-occurrence graph (parts appearing in the same order), via the
    * degree-ordered orientation in `operators.Triangles` — wedges are
    * enumerated only from each triangle's unique out-degree-2 pivot
    * (max out-degree O(sqrt(m)), so no hub-node d^2 blow-up) and each
    * triangle counts exactly once. Output is the global census +
    * clustering coefficient; construction ground truth (cliques,
    * paths, known censuses) in GraphOpsSpec. Reads the STAGED
    * degree-oriented adjacency ([[basketAdjacency]]) — the degree agg
    * and orientation joins are paid once per dataset dir, not per run.
    */
  def q153_triangle_count(s: SparkSession, dir: String): DataFrame =
    operators.Triangles.censusFromAdjacency(basketAdjacency(s, dir))

  /** Graph pillar #4: the 3-core of the REPEAT part co-occurrence
    * graph (parts that shared >= 2 orders — thresholding prunes the
    * near-regular single-co-occurrence noise so the peeling has real
    * structure: 10 rounds deep at sf0.01). Like the other iterative
    * operators (q53, q131) this runs driver-side fixpoint rounds at
    * construction time — the documented exception to the plan-only
    * rule. The DuckDB oracle unrolls 12 peel rounds; peeling is
    * idempotent once converged, so the two spare rounds are no-ops,
    * never a divergence.
    */
  def q162_kcore(s: SparkSession, dir: String): DataFrame = {
    val pairs = basketPairsW(s, dir)
      .filter(col("w") >= 2)
      .select(col("u"), col("v"))
    operators.KCore.kCore(pairs, "u", "v", k = 3).orderBy("node")
  }

  /** Multi-source BFS hop distance over the repeat co-occurrence
    * graph (same graph as q162): distance from every part to the
    * nearest "hub" part (ids divisible by 50) — the fifth graph
    * pillar. Synchronous frontier expansion with a fixed hop cap;
    * the cap (10) exceeds the graph's seed eccentricity at every SF,
    * and extra rounds past the fixpoint are no-ops, so the unrolled
    * 10-round relaxation oracle reproduces the result exactly.
    */
  def q165_bfs_hops(s: SparkSession, dir: String): DataFrame = {
    val pairs = basketPairsW(s, dir)
      .filter(col("w") >= 2)
      .select(col("u"), col("v"))
    val seeds = pairs.select(col("u").as("node"))
      .union(pairs.select(col("v").as("node")))
      .distinct().filter(col("node") % 50 === 0)
    operators.Bfs.hops(pairs, "u", "v", seeds, maxRounds = 10).orderBy("node")
  }

  /** Community sizes by deterministic synchronous label propagation
    * (operators/LabelProp) over the part co-occurrence graph — the
    * sixth graph pillar. 4 rounds: labels flood dense co-purchase
    * neighborhoods but not the sparse bridges between them, so the
    * histogram separates communities that connected components (q53)
    * would merge. Fixed rounds + plurality-then-smallest-label
    * tie-break make the 4-round unrolled SQL oracle exact.
    */
  def q166_label_prop(s: SparkSession, dir: String): DataFrame = {
    val pairs = basketPairsW(s, dir)
      .filter(col("w") >= 2)
      .select(col("u"), col("v"))
    operators.LabelProp.run(pairs, "u", "v", rounds = 4)
      .groupBy("label").agg(count(lit(1)).as("n_nodes"))
      .orderBy("label")
  }

  /** Personalized PageRank over q131's word co-occurrence graph,
    * teleporting to ONE seed (the most frequent word): mass radiates
    * from the seed through the link structure — the related-items /
    * "more like this" ranking, where classic PageRank would return
    * global importance regardless of the seed. Same exact fixed-point
    * integer arithmetic as q131 (bit-identical across engines and
    * reduction orders), so the unrolled 3-round SQL oracle is exact;
    * the seed mask is one broadcast left-join multiplier.
    */
  def q191_ppr_related(s: SparkSession, dir: String): DataFrame = {
    // r13 optimization: q131's persist pattern — one tokenize pass; the
    // 30-row ordered top-count frame additionally feeds the seed pick
    // (its own groupBy re-scan before). Bit-identical results.
    val toks = tWide(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(filter(split(lower(col("text")), "[^a-z]+"),
          w => length(w) >= 4))).as("w"))
    val topC = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(30)
      .persistTracked()
    val top = topC.select("w")
    val kept = toks.join(broadcast(top), "w").persistTracked()
    val edges = kept.select(col("doc_id"), col("w").as("src"))
      .join(kept.select(col("doc_id"), col("w").as("dst")), "doc_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val seed = topC.orderBy(desc("n"), col("w")).limit(1).select(col("w").as("node"))
    operators.PageRank.run(edges, iterations = 3,
        nodeUniverse = Some(top.select(col("w").as("node"))),
        teleportSeeds = Some(seed))
      .select(col("node"), col("rank").as("ppr"))
      .orderBy(desc("ppr"), col("node"))
  }

  /** Adamic-Adar link prediction on the repeat co-purchase graph
    * (parts co-ordered >= 2 times, q162's graph family): for every
    * NON-adjacent pair with a common neighbor, AA = Σ_z 1/ln(deg z)
    * over common neighbors z — the classic "customers also bought"
    * scorer, where rare shared neighbors count more than hubs. Shape:
    * the edge set is persisted (consumed 4×: two 2-path sides, the
    * adjacency anti-join, the degree agg); 2-path enumeration is the
    * e⋈e self-join on the middle node — Σ deg(z)² rows, the inherent
    * cost of exact AA, bounded here by the co>=2 sparsification and at
    * corpus scale by a q171-style degree cap on z; the anti-join
    * removes existing edges; everything shuffles on node keys with
    * map-side combine on the final (a,b) agg.
    */
  def q198_adamic_adar(s: SparkSession, dir: String): DataFrame = {
    // The co>=2 edge set IS basketPairsW's staged frame symmetrized:
    // the old bipartite self-join + groupBy chain counted ordered
    // (src,dst) pairs per order — identical in both directions to the
    // staged unordered count — so three shuffles over the pair
    // explosion collapse to one staged read + union.
    val ew = basketPairsW(s, dir).filter(col("w") >= 2)
    val e = ew.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(ew.select(col("v").as("src"), col("u").as("dst")))
      .persistTracked()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val cand = e.select(col("src").as("a"), col("dst").as("z"))
      .join(e.select(col("src").as("z2"), col("dst").as("b")), col("z") === col("z2"))
      .filter(col("a") < col("b")).select("a", "b", "z")
    val nonadj = cand.join(e.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_anti")
    nonadj.join(deg, col("z") === col("node"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("common"), round(sum(lit(1.0) / log(col("d"))), 4).as("aa"))
      .orderBy(desc("aa"), desc("common"), col("a"), col("b"))
      .limit(20)
  }

  /** HITS hubs/authorities (Kleinberg 1999) on the customer→part
    * purchase BIPARTITE graph: hubs = customers whose baskets
    * concentrate on widely-bought parts, authorities = parts bought by
    * strong hubs. Two unrolled rounds in UNNORMALIZED integer
    * arithmetic — like q131's PageRank, dropping the float
    * normalization (which only rescales, never reorders) is what makes
    * the fixpoint EXACTLY reproducible in SQL: h0=1, a1 = in-degree,
    * h1 = Σ a1, a2 = Σ h1; magnitudes stay well inside int64 for any
    * bounded round count. Shape: the distinct edge list is persisted
    * (consumed by all four round-aggregates), every round is one
    * equi-join + map-side-combined sum shuffled on a node key, and the
    * two top-8 heads plan TakeOrderedAndProject.
    *
    * The bipartite edge list (orders⋈lineitem → distinct (c,p)) is the
    * query's dominant cost — a join + distinct over the two biggest
    * tables feeding four CHEAP fixpoint rounds — and it is
    * dataset-derived and deterministic, so it is STAGED once per
    * dataset dir (basketPairsW's pattern): first run pays the build +
    * a 2-int64-column parquet write, repeat runs scan the staged
    * frame. On a cluster: "materialize the interaction edge list per
    * corpus snapshot", shared by every graph algorithm over it.
    */
  def q201_hits(s: SparkSession, dir: String): DataFrame = {
    val staged = stagedParquet(s"cpe|$dir") { out =>
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey").as("c"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_partkey").as("p")),
          "o_orderkey")
        .select("c", "p").distinct()
        .write.mode("overwrite").parquet(out)
    }
    val e = s.read.parquet(staged).persistTracked()
    val a1 = e.groupBy("p").agg(count(lit(1)).as("a")) // h0 = 1
    val h1 = e.join(a1, "p").groupBy("c").agg(sum("a").as("h"))
    val a2 = e.join(h1, "c").groupBy("p").agg(sum("h").as("a"))
    val h2 = e.join(a2, "p").groupBy("c").agg(sum("a").as("h"))
    val hubs = h2.select(lit("hub").as("kind"), col("c").as("node"), col("h").as("score"))
      .orderBy(desc("score"), col("node")).limit(8)
    val auths = a2.select(lit("authority").as("kind"), col("p").as("node"), col("a").as("score"))
      .orderBy(desc("score"), col("node")).limit(8)
    hubs.unionAll(auths).orderBy(col("kind"), desc("score"), col("node"))
  }

  /** Per-node local clustering coefficient on the co-purchase graph —
    * the node-grain community-density report behind q153's one global
    * number (which nodes sit in tight clusters vs radiate as hubs).
    * Same degree-ordered oriented enumeration (max out-degree O(√m)
    * regardless of hub skew), different final aggregation: each closed
    * triangle credits its three corners, and a node-sized left join
    * back onto the degree table keeps triangle-free nodes at exactly
    * 0. Floats: 2·tri exact, d(d−1) integer, one correctly-rounded
    * division → the ranking is engine-identical. Reads the STAGED
    * degree-oriented adjacency ([[basketAdjacency]], shared with
    * q153) — per run only the broadcast, intersect, and credit
    * aggregation remain.
    */
  def q212_local_clustering(s: SparkSession, dir: String): DataFrame =
    operators.Triangles.perNodeFromAdjacency(basketAdjacency(s, dir), minDeg = 5)
      .orderBy(col("lcc").desc, col("node").asc)
      .limit(20)

  /** Weighted single-source shortest distances (Bellman-Ford, the
    * sixth graph pillar after PageRank / CC / triangles / k-core /
    * BFS): distance from the anchor part over the co-purchase graph
    * with affinity weights w = 1000 ⌊/⌋ co-count — strong ties are
    * short hops, so "distance" reads as relatedness depth, the
    * recommender's graph-radius feature. Four min-plus rounds give
    * EXACTLY the min weight over ≤4-edge paths (the closed form the
    * bounded recursive-CTE oracle reproduces integer-for-integer);
    * each round is one equi-join + one map-side-combined min-agg with
    * per-round lineage truncation.
    */
  def q230_sssp(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bfs
    val pairs = basketPairsW(s, dir)
      .withColumnRenamed("w", "c")
      .filter(col("c") >= 2)
      .withColumn("w", (lit(1000) / col("c")).cast("long"))
    val seed = pairs.agg(min(least(col("u"), col("v"))).as("n"))
    Bfs.weightedDistances(pairs, "u", "v", "w", seed, rounds = 4)
      .orderBy(col("dist").asc, col("node").asc)
      .limit(20)
  }

  /** Degree assortativity (Newman 2002) of the co-purchase graph: the
    * Pearson correlation of endpoint degrees over directed edge ends —
    * POSITIVE means hubs connect to hubs (social-graph shape),
    * NEGATIVE means hubs fan out to leaves (catalog shape), and which
    * one you have decides whether degree-based partitioning skews.
    * Every moment (M, Σx, Σxy, Σx²) is an exact 64-bit integer over
    * the degree-joined edge list; r is one division over IEEE sqrts —
    * engine-identical. The symmetric edge list makes Σx = Σy, so one
    * moment set suffices.
    */
  def q244_assortativity(s: SparkSession, dir: String): DataFrame = {
    val pairs = basketPairs(s, dir) // staged distinct — no re-distinct
    val deg = pairs.select(col("u").as("n")).union(pairs.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val ends = pairs.select(col("u"), col("v"))
      .union(pairs.select(col("v").as("u"), col("u").as("v")))
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
    val m = ends.agg(
      count(lit(1)).as("mm"),
      sum("du").as("sx"), sum(col("du") * col("du")).as("sxx"),
      sum(col("du") * col("dv")).as("sxy"))
    // symmetry collapses the usual sqrt(..)·sqrt(..) denominator to the
    // SAME integer as the variance term — r is one exact-integer ratio,
    // no sqrt in the hash path at all
    m.select(
      (col("mm") / 2).cast("long").as("n_edges"),
      round((col("mm") * col("sxy") - col("sx") * col("sx")) /
        (col("mm") * col("sxx") - col("sx") * col("sx")), 4).as("assortativity"))
  }

  /** Rich-club coefficient φ(k): edge density among nodes with degree
    * > k — do the hubs of the co-purchase graph form their own dense
    * club (hierarchical backbone) or avoid each other? The third
    * hub-wiring lens after q212 (local density) and q244 (pairwise
    * correlation): assortativity can be ~0 while a rich club still
    * exists. Exact integers end to end — |S|, edges-within via a
    * broadcast semi-join of the canonical edge list against the club,
    * φ = one division by C(|S|,2).
    */
  def q255_rich_club(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    // Staged distinct parquet — re-reads are cheap columnar scans, so
    // neither the old .distinct() nor the persist earns its keep.
    val pairs = basketPairs(s, dir)
    val deg = pairs.select(col("u").as("n")).union(pairs.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val club = deg.filter(col("d") > k).select("n")
    val clubSize = club.agg(count(lit(1)).as("s"))
    val within = pairs
      .join(broadcast(club.select(col("n").as("u"))), Seq("u"), "left_semi")
      .join(broadcast(club.select(col("n").as("v"))), Seq("v"), "left_semi")
      .agg(count(lit(1)).as("e_within"))
    within.crossJoin(broadcast(clubSize))
      .select(lit(k).as("k"), col("s").as("club_size"), col("e_within"),
        round(col("e_within") / (col("s") * (col("s") - 1) / 2), 4).as("phi"))
  }

  /** Newman modularity of the part co-occurrence graph (parts in the
    * same order, q153's pair build) under the BRAND partition —
    * "is this community assignment better than chance", the quality
    * number q166's label propagation optimizes for but never reports.
    * Q = Σ_c [m_c/m − (D_c/2m)²] over the distinct-edge graph; the
    * community map rides in as a broadcast (part is a dimension), the
    * per-community frame is 25 rows, and the only corpus-scale work is
    * the bounded ≤21-pairs-per-order fan-out. Contributions are
    * rounded before the final 5-term sum, then the sum re-rounded, so
    * engine addition order cannot leak into the hash.
    */
  def q301_modularity(s: SparkSession, dir: String): DataFrame = {
    // Staged distinct parquet: both the labeled-edge join and the
    // degree count read it as cheap columnar scans — no persist needed.
    val edges = basketPairs(s, dir)
    val comm = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val e = edges
      .join(broadcast(comm.select(col("p_partkey").as("u"), col("p_brand").as("cu"))), "u")
      .join(broadcast(comm.select(col("p_partkey").as("v"), col("p_brand").as("cv"))), "v")
    val m = e.agg(count(lit(1)).as("m"))
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val dc = deg
      .join(broadcast(comm.select(col("p_partkey").as("node"), col("p_brand").as("community"))), "node")
      .groupBy("community").agg(sum("d").as("degree_sum"))
    val mc = e.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("intra_edges"))
    val rows = dc.join(mc, Seq("community"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(m))
      .withColumn("contribution", round(
        col("intra_edges").cast("double") / col("m") -
          (col("degree_sum").cast("double") / (lit(2L) * col("m"))) *
          (col("degree_sum").cast("double") / (lit(2L) * col("m"))), 6))
    val q = rows.agg(round(sum("contribution"), 6).as("q_modularity"))
    rows.crossJoin(broadcast(q))
      .select("community", "intra_edges", "degree_sum", "contribution", "q_modularity")
      .orderBy("community")
  }

  /** Near-dup cluster SIZE histogram — the dedup-endgame readout over
    * q53's machinery ("how much of the corpus sits in how-big
    * clusters"; a long tail of pairs vs one giant component demand
    * different dedup strategies, and the giant component is THE
    * failure mode of over-loose LSH thresholds at scale). Docs in no
    * near-dup pair enter as singleton components computed from the
    * corpus total — no scan of the non-duplicated majority beyond the
    * count. Oracle replays the exact-Jaccard pair graph + recursive CC
    * in DuckDB (q53's oracle) and aggregates the same histogram.
    */
  def q309_component_sizes(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Components
    val pairs = lshPairsStaged(s, dir)
    val sizes = Components.connectedComponents(pairs, "id_a", "id_b")
      .groupBy("component").agg(count(lit(1)).as("sz"))
    val hist = sizes.groupBy("sz").agg(count(lit(1)).as("n_components"))
    val tot = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val inGraph = sizes.agg(coalesce(sum("sz"), lit(0L)).as("n_in"))
    val singles = tot.crossJoin(broadcast(inGraph))
      .select(lit(1L).as("sz"), (col("n_docs") - col("n_in")).as("n_components"))
    hist.unionAll(singles)
      .groupBy("sz").agg(sum("n_components").as("n_components"))
      .filter(col("n_components") > 0)
      .orderBy("sz")
  }

  private[graft] def graphAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_dedup_components" -> (q53_dedup_components _),
    "q75_cooccurrence"  -> (q75_cooccurrence _),
    "q76_posting_lists" -> (q76_posting_lists _),
    "q131_pagerank"     -> (q131_pagerank _),
    "q153_triangle_count" -> (q153_triangle_count _),
    "q162_kcore"        -> (q162_kcore _),
    "q165_bfs_hops"     -> (q165_bfs_hops _),
    "q166_label_prop"   -> (q166_label_prop _),
    "q191_ppr_related"  -> (q191_ppr_related _),
    "q198_adamic_adar"  -> (q198_adamic_adar _),
    "q201_hits"         -> (q201_hits _),
    "q212_local_clustering" -> (q212_local_clustering _),
    "q230_sssp"         -> (q230_sssp _),
    "q244_assortativity" -> (q244_assortativity _),
    "q255_rich_club"    -> (q255_rich_club _),
    "q301_modularity"   -> (q301_modularity _),
    "q309_component_sizes" -> (q309_component_sizes _),
  )

  private[graft] def graphOracle: Map[String, String] = Map(
    "q53_dedup_components" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |                   for i in range(1, len(toks) - 1)]) AS sh
        |  FROM tok WHERE len(toks) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS doc_id, min(lab) AS component,
        |  CASE WHEN id = min(lab) THEN 1 ELSE 0 END AS is_canonical
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q75_cooccurrence" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0)
        |SELECT a.w AS w_a, b.w AS w_b, count(*) AS n_docs
        |FROM words a JOIN words b ON a.doc_id = b.doc_id AND a.w < b.w
        |GROUP BY 1, 2 ORDER BY n_docs DESC, w_a, w_b LIMIT 25""".stripMargin,
    "q76_posting_lists" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |dfreq AS (SELECT w, count(*) AS df FROM words GROUP BY w),
        |top AS (
        |  SELECT w, array_to_string(list_sort(list(doc_id)), ',') AS postings
        |  FROM (SELECT w, doc_id FROM (
        |    SELECT w, doc_id, row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rn
        |    FROM words) r WHERE rn <= 10) f
        |  GROUP BY w)
        |SELECT d.w AS word, d.df, t.postings
        |FROM dfreq d JOIN top t ON d.w = t.w ORDER BY word""".stripMargin,
    "q131_pagerank" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                         t -> len(t) >= 4)) AS w
        |    FROM documents)),
        |top AS (SELECT w, count(*) AS n FROM toks GROUP BY w
        |        ORDER BY n DESC, w LIMIT 30),
        |e AS (SELECT DISTINCT a.w AS src, b.w AS dst
        |      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w <> b.w
        |      JOIN top ta ON ta.w = a.w JOIN top tb ON tb.w = b.w),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT w AS node, CAST(1000000 AS BIGINT) AS r FROM top),
        |r1 AS (SELECT t.w AS node,
        |    CAST(150000 + (coalesce(s.m, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM top t LEFT JOIN (
        |    SELECT e.dst AS dst, sum(r0.r // deg.d) AS m
        |    FROM e JOIN r0 ON e.src = r0.node JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON s.dst = t.w),
        |r2 AS (SELECT t.w AS node,
        |    CAST(150000 + (coalesce(s.m, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM top t LEFT JOIN (
        |    SELECT e.dst AS dst, sum(r1.r // deg.d) AS m
        |    FROM e JOIN r1 ON e.src = r1.node JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON s.dst = t.w),
        |r3 AS (SELECT t.w AS node,
        |    CAST(150000 + (coalesce(s.m, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM top t LEFT JOIN (
        |    SELECT e.dst AS dst, sum(r2.r // deg.d) AS m
        |    FROM e JOIN r2 ON e.src = r2.node JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON s.dst = t.w)
        |SELECT node, r AS pr FROM r3 ORDER BY pr DESC, node""".stripMargin,
    "q153_triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, count(*) AS d FROM (
        |          SELECT u AS node FROM pairs
        |          UNION ALL SELECT v AS node FROM pairs) GROUP BY node),
        |orient AS (SELECT
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v)
        |         THEN p.u ELSE p.v END AS s,
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v)
        |         THEN p.v ELSE p.u END AS t
        |  FROM pairs p JOIN deg du ON du.node = p.u
        |               JOIN deg dv ON dv.node = p.v),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM orient e1
        |        JOIN orient e2 ON e1.s = e2.s AND e1.t < e2.t
        |        JOIN pairs c ON c.u = e1.t AND c.v = e2.t),
        |wtot AS (SELECT CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
        |nodes AS (SELECT count(*) AS n_nodes FROM deg),
        |edges AS (SELECT count(*) AS n_edges FROM pairs)
        |SELECT n_triangles, n_wedges, n_nodes, n_edges,
        |  round(3.0 * n_triangles / n_wedges, 4) AS clustering_coeff
        |FROM tri, wtot, nodes, edges""".stripMargin,
    "q162_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |s1 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY node HAVING count(*) >= 3),
        |e1 AS MATERIALIZED (
        |  SELECT u, v FROM e0
        |  JOIN s1 a ON a.node = e0.u JOIN s1 b ON b.node = e0.v),
        |s2 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
        |  GROUP BY node HAVING count(*) >= 3),
        |e2 AS MATERIALIZED (
        |  SELECT u, v FROM e1
        |  JOIN s2 a ON a.node = e1.u JOIN s2 b ON b.node = e1.v),
        |s3 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
        |  GROUP BY node HAVING count(*) >= 3),
        |e3 AS MATERIALIZED (
        |  SELECT u, v FROM e2
        |  JOIN s3 a ON a.node = e2.u JOIN s3 b ON b.node = e2.v),
        |s4 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
        |  GROUP BY node HAVING count(*) >= 3),
        |e4 AS MATERIALIZED (
        |  SELECT u, v FROM e3
        |  JOIN s4 a ON a.node = e3.u JOIN s4 b ON b.node = e3.v),
        |s5 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e4 UNION ALL SELECT v FROM e4)
        |  GROUP BY node HAVING count(*) >= 3),
        |e5 AS MATERIALIZED (
        |  SELECT u, v FROM e4
        |  JOIN s5 a ON a.node = e4.u JOIN s5 b ON b.node = e4.v),
        |s6 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e5 UNION ALL SELECT v FROM e5)
        |  GROUP BY node HAVING count(*) >= 3),
        |e6 AS MATERIALIZED (
        |  SELECT u, v FROM e5
        |  JOIN s6 a ON a.node = e5.u JOIN s6 b ON b.node = e5.v),
        |s7 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e6 UNION ALL SELECT v FROM e6)
        |  GROUP BY node HAVING count(*) >= 3),
        |e7 AS MATERIALIZED (
        |  SELECT u, v FROM e6
        |  JOIN s7 a ON a.node = e6.u JOIN s7 b ON b.node = e6.v),
        |s8 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e7 UNION ALL SELECT v FROM e7)
        |  GROUP BY node HAVING count(*) >= 3),
        |e8 AS MATERIALIZED (
        |  SELECT u, v FROM e7
        |  JOIN s8 a ON a.node = e7.u JOIN s8 b ON b.node = e7.v),
        |s9 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e8 UNION ALL SELECT v FROM e8)
        |  GROUP BY node HAVING count(*) >= 3),
        |e9 AS MATERIALIZED (
        |  SELECT u, v FROM e8
        |  JOIN s9 a ON a.node = e8.u JOIN s9 b ON b.node = e8.v),
        |s10 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e9 UNION ALL SELECT v FROM e9)
        |  GROUP BY node HAVING count(*) >= 3),
        |e10 AS MATERIALIZED (
        |  SELECT u, v FROM e9
        |  JOIN s10 a ON a.node = e9.u JOIN s10 b ON b.node = e9.v),
        |s11 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e10 UNION ALL SELECT v FROM e10)
        |  GROUP BY node HAVING count(*) >= 3),
        |e11 AS MATERIALIZED (
        |  SELECT u, v FROM e10
        |  JOIN s11 a ON a.node = e10.u JOIN s11 b ON b.node = e10.v),
        |s12 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e11 UNION ALL SELECT v FROM e11)
        |  GROUP BY node HAVING count(*) >= 3),
        |e12 AS MATERIALIZED (
        |  SELECT u, v FROM e11
        |  JOIN s12 a ON a.node = e11.u JOIN s12 b ON b.node = e11.v),
        |fin AS (SELECT u, v FROM e12)
        |SELECT node, count(*) AS core_deg
        |FROM (SELECT u AS node FROM fin UNION ALL SELECT v FROM fin)
        |GROUP BY node ORDER BY node""".stripMargin,
    "q165_bfs_hops" -> {
      // 10 unrolled min-relaxation rounds (MATERIALIZED, as in q162's
      // peel oracle): d_i(n) = shortest distance using <= i hops, and
      // the seed eccentricity is < 10 at every SF, so d10 is the BFS
      // fixpoint. Rounds are generated, not hand-written.
      val rounds = (1 to 10).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT g.b AS node, d${i - 1}.dist + 1 AS dist
           |    FROM d${i - 1} JOIN g ON g.a = d${i - 1}.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |g AS MATERIALIZED (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
         |d0 AS MATERIALIZED (
         |  SELECT DISTINCT x AS node, 0 AS dist
         |  FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
         |  WHERE x % 50 = 0),
         |$rounds
         |SELECT node, dist::BIGINT AS dist FROM d10 ORDER BY node""".stripMargin
    },
    "q166_label_prop" -> {
      // 4 unrolled synchronous LPA rounds. Each round is the exact
      // deterministic recurrence: plurality neighbor label, ties to
      // the smallest label, every node updating from the previous
      // round (QUALIFY row_number ORDER BY c DESC, label ASC = Spark's
      // max_by over the (count, -label) struct).
      val rounds = (1 to 4).map { i =>
        s"""l$i AS MATERIALIZED (
           |  SELECT node, label FROM (
           |    SELECT g.b AS node, l.label, count(*) AS c
           |    FROM g JOIN l${i - 1} l ON g.a = l.node
           |    GROUP BY 1, 2)
           |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT a.pk AS u, b.pk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |g AS MATERIALIZED (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
         |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM g),
         |$rounds
         |SELECT label, count(*)::BIGINT AS n_nodes FROM l4
         |GROUP BY label ORDER BY label""".stripMargin
    },
    "q191_ppr_related" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                         t -> len(t) >= 4)) AS w
        |    FROM documents)),
        |top AS (SELECT w, count(*) AS n FROM toks GROUP BY w
        |        ORDER BY n DESC, w LIMIT 30),
        |seed AS (SELECT w FROM top ORDER BY n DESC, w LIMIT 1),
        |e AS (SELECT DISTINCT a.w AS src, b.w AS dst
        |      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w <> b.w
        |      JOIN top ta ON ta.w = a.w JOIN top tb ON tb.w = b.w),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT t.w AS node,
        |    CAST(CASE WHEN t.w = (SELECT w FROM seed) THEN 1000000 ELSE 0 END AS BIGINT) AS r
        |  FROM top t),
        |r1 AS (SELECT t.w AS node,
        |    CAST(CASE WHEN t.w = (SELECT w FROM seed) THEN 150000 ELSE 0 END
        |         + (coalesce(s.m, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM top t LEFT JOIN (
        |    SELECT e.dst AS dst, sum(r0.r // deg.d) AS m
        |    FROM e JOIN r0 ON e.src = r0.node JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON s.dst = t.w),
        |r2 AS (SELECT t.w AS node,
        |    CAST(CASE WHEN t.w = (SELECT w FROM seed) THEN 150000 ELSE 0 END
        |         + (coalesce(s.m, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM top t LEFT JOIN (
        |    SELECT e.dst AS dst, sum(r1.r // deg.d) AS m
        |    FROM e JOIN r1 ON e.src = r1.node JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON s.dst = t.w),
        |r3 AS (SELECT t.w AS node,
        |    CAST(CASE WHEN t.w = (SELECT w FROM seed) THEN 150000 ELSE 0 END
        |         + (coalesce(s.m, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM top t LEFT JOIN (
        |    SELECT e.dst AS dst, sum(r2.r // deg.d) AS m
        |    FROM e JOIN r2 ON e.src = r2.node JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON s.dst = t.w)
        |SELECT node, r AS ppr FROM r3 ORDER BY ppr DESC, node""".stripMargin,
    "q198_adamic_adar" ->
      """WITH pe AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem GROUP BY 1, 2),
        |e AS (SELECT a.pk AS src, b.pk AS dst
        |      FROM pe a JOIN pe b ON a.ok = b.ok AND a.pk <> b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT src AS node, count(*)::BIGINT AS d FROM e GROUP BY src),
        |cand AS (SELECT e1.src AS a, e2.dst AS b, e1.dst AS z
        |         FROM e e1 JOIN e e2 ON e1.dst = e2.src AND e1.src < e2.dst),
        |nonadj AS (SELECT c.a, c.b, c.z FROM cand c
        |           LEFT JOIN e ON e.src = c.a AND e.dst = c.b WHERE e.src IS NULL)
        |SELECT a, b, count(*)::BIGINT AS common,
        |  round(sum(1.0 / ln(deg.d)), 4) AS aa
        |FROM nonadj JOIN deg ON deg.node = nonadj.z
        |GROUP BY a, b
        |ORDER BY aa DESC, common DESC, a, b LIMIT 20""".stripMargin,
    "q201_hits" ->
      """WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |a1 AS (SELECT p, count(*)::BIGINT AS a FROM e GROUP BY p),
        |h1 AS (SELECT e.c, sum(a1.a)::BIGINT AS h FROM e JOIN a1 ON a1.p = e.p GROUP BY e.c),
        |a2 AS (SELECT e.p, sum(h1.h)::BIGINT AS a FROM e JOIN h1 ON h1.c = e.c GROUP BY e.p),
        |h2 AS (SELECT e.c, sum(a2.a)::BIGINT AS h FROM e JOIN a2 ON a2.p = e.p GROUP BY e.c),
        |hubs AS (SELECT 'hub' AS kind, c AS node, h AS score FROM h2
        |         ORDER BY score DESC, node LIMIT 8),
        |auths AS (SELECT 'authority' AS kind, p AS node, a AS score FROM a2
        |          ORDER BY score DESC, node LIMIT 8)
        |SELECT * FROM (SELECT * FROM hubs UNION ALL SELECT * FROM auths)
        |ORDER BY kind, score DESC, node""".stripMargin,
    "q212_local_clustering" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, count(*)::BIGINT AS d FROM (
        |          SELECT u AS node FROM pairs
        |          UNION ALL SELECT v AS node FROM pairs) GROUP BY node),
        |orient AS (SELECT
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v)
        |         THEN p.u ELSE p.v END AS s,
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v)
        |         THEN p.v ELSE p.u END AS t
        |  FROM pairs p JOIN deg du ON du.node = p.u
        |               JOIN deg dv ON dv.node = p.v),
        |tri3 AS (SELECT e1.s AS a, e1.t AS x, e2.t AS y
        |        FROM orient e1
        |        JOIN orient e2 ON e1.s = e2.s AND e1.t < e2.t
        |        JOIN pairs c ON c.u = e1.t AND c.v = e2.t),
        |pn AS (SELECT node, count(*)::BIGINT AS n_tri FROM (
        |         SELECT a AS node FROM tri3
        |         UNION ALL SELECT x FROM tri3
        |         UNION ALL SELECT y FROM tri3) GROUP BY node)
        |SELECT d.node, d.d, coalesce(pn.n_tri, 0)::BIGINT AS n_tri,
        |  round(2.0 * coalesce(pn.n_tri, 0) / (d.d * (d.d - 1)), 4) AS lcc
        |FROM deg d LEFT JOIN pn ON d.node = pn.node
        |WHERE d.d >= 5
        |ORDER BY lcc DESC, d.node ASC LIMIT 20""".stripMargin,
    "q230_sssp" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT a.pk AS u, b.pk AS v, count(*) AS c
        |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT u AS s, v AS d, 1000 // c AS w FROM pairs
        |      UNION ALL SELECT v, u, 1000 // c FROM pairs),
        |seed AS (SELECT min(s) AS n FROM e),
        |walk(node, dist, depth) AS (
        |  SELECT n, 0, 0 FROM seed
        |  UNION ALL
        |  SELECT e.d, walk.dist + e.w, depth + 1
        |  FROM walk JOIN e ON e.s = walk.node WHERE depth < 4)
        |SELECT node, min(dist)::BIGINT AS dist FROM walk
        |GROUP BY node ORDER BY dist ASC, node ASC LIMIT 20""".stripMargin,
    "q244_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT n, count(*)::BIGINT AS d FROM (
        |          SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY n),
        |ends AS (SELECT du.d AS du, dv.d AS dv
        |  FROM (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs) e
        |  JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
        |m AS (SELECT count(*)::BIGINT AS mm, sum(du)::BIGINT AS sx,
        |    sum(du * du)::BIGINT AS sxx, sum(du * dv)::BIGINT AS sxy FROM ends)
        |SELECT (mm // 2)::BIGINT AS n_edges,
        |  round((mm * sxy - sx * sx)::DOUBLE / (mm * sxx - sx * sx), 4)
        |    AS assortativity
        |FROM m""".stripMargin,
    "q255_rich_club" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT n, count(*)::BIGINT AS d FROM (
        |          SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY n),
        |club AS (SELECT n FROM deg WHERE d > 10),
        |cs AS (SELECT count(*)::BIGINT AS s FROM club),
        |wi AS (SELECT count(*)::BIGINT AS e_within FROM pairs
        |  WHERE u IN (SELECT n FROM club) AND v IN (SELECT n FROM club))
        |SELECT 10 AS k, s AS club_size, e_within,
        |  round(e_within::DOUBLE / (s * (s - 1) / 2), 4) AS phi
        |FROM wi, cs""".stripMargin,
    "q301_modularity" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS (SELECT u, v, pu.p_brand AS cu, pv.p_brand AS cv
        |  FROM pairs JOIN part pu ON u = pu.p_partkey
        |             JOIN part pv ON v = pv.p_partkey),
        |m AS (SELECT count(*)::BIGINT AS m FROM e),
        |deg AS (SELECT node, count(*)::BIGINT AS d FROM (
        |    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
        |  GROUP BY node),
        |dc AS (SELECT p_brand AS community, sum(d)::BIGINT AS degree_sum
        |  FROM deg JOIN part ON node = p_partkey GROUP BY 1),
        |mc AS (SELECT cu AS community, count(*)::BIGINT AS intra_edges
        |  FROM e WHERE cu = cv GROUP BY 1),
        |rows_ AS (SELECT community, coalesce(intra_edges, 0)::BIGINT AS intra_edges,
        |    degree_sum,
        |    round(coalesce(intra_edges, 0) / m::DOUBLE -
        |      (degree_sum / (2.0 * m)) * (degree_sum / (2.0 * m)), 6) AS contribution
        |  FROM dc LEFT JOIN mc USING (community), m),
        |q AS (SELECT round(sum(contribution), 6) AS q_modularity FROM rows_)
        |SELECT community, intra_edges, degree_sum, contribution, q_modularity
        |FROM rows_, q ORDER BY community""".stripMargin,
    "q309_component_sizes" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |                   for i in range(1, len(toks) - 1)]) AS sh
        |  FROM tok WHERE len(toks) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |sizes AS (SELECT component, count(*)::BIGINT AS sz FROM comp GROUP BY 1),
        |hist AS (SELECT sz, count(*)::BIGINT AS n_components FROM sizes GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |ing AS (SELECT coalesce(sum(sz), 0)::BIGINT AS n_in FROM sizes)
        |SELECT sz, sum(n_components)::BIGINT AS n_components FROM (
        |  SELECT sz, n_components FROM hist
        |  UNION ALL SELECT 1::BIGINT, n_docs - n_in FROM tot, ing)
        |GROUP BY sz HAVING sum(n_components) > 0 ORDER BY sz""".stripMargin,
  )
}
