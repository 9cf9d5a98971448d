package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Query family: deduplication & record linkage — exact/minhash/simhash/LSH/containment/edit-distance families.
  * Split from the monolithic Queries.scala (round 13) with def
  * bodies and oracle SQL byte-verbatim; surfaced unchanged via
  * [[Queries.all]] / [[Queries.oracle]]. */
private[graft] trait QueriesDedup { this: Queries.type =>

  /** E19: exact dedup on documents.text — expressed as keep-min-id per
    * text group (deterministic, unlike dropDuplicates' arbitrary row).
    * At 100 TB: pre-hash the text (`xxhash64`) so the shuffle key is 8
    * bytes, not the document body — see q19 variants in later rounds.
    */
  def q06_dedup_exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dupes"))
      .select("doc_id", "dupes")
      .orderBy("doc_id")

  /** North-star MinHash+LSH near-dup detection: shingle → 32-hash
    * signature → 16 bands → bucket join → exact-Jaccard re-rank at
    * threshold 0.5. The data's planted near-dups all sit at
    * jaccard >= 0.9 with nothing in (0.1, 0.9), so LSH recall here is
    * 1 - ~1e-11 and the exact all-pairs SQL oracle is safe. At scale
    * the shuffle carries only (band_key, id, shingles) — never bodies.
    */
  def q23_dedup_minhash(s: SparkSession, dir: String): DataFrame =
    lshPairsStaged(s, dir)
      .orderBy("id_a", "id_b")

  /** SimHash fingerprint pair-distance histogram over a bounded probe
    * set (first 50 docs): demonstrates the 64-bit sketch + Hamming
    * path. Hash-based — no SQL oracle (rows-only driver check);
    * construction-based ground truth lives in LlmOpsSpec.
    */
  def q24_simhash_hamming(s: SparkSession, dir: String): DataFrame = {
    val fps = t(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        TextFunctions.simhash64(TextFunctions.tokens(col("text"))).as("fp"))
    val a = fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(TextFunctions.hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming")
  }

  /** BANDED hyperplane-LSH embedding near-dup (the scale path for
    * very-near duplicates), ORACLE-JUDGED against the exact all-pairs
    * SQL — q23's planted-gap structure applied to embeddings: every
    * base vector gets a deterministic arithmetic TWIN (id+100000,
    * each component nudged by ±0.03 from exact integer hashing — SQL-
    * expressible, so DuckDB builds the identical corpus), planting one
    * near-dup pair per vector at cosine 0.985–0.989 while the
    * synthetic background tops out near 0.55 — nothing in between. At
    * 8 planes × 24 tables a planted pair misses every table with
    * probability ~2e-11 (and the plane matrix is derived from the
    * deterministic splitmix64 finalizer — [[graft.expr.Splitmix]] via
    * Dedup.planeMatrix — so recall on THIS corpus is a fixed fact the oracle
    * compare pins at every SF), so the exact all-pairs oracle at
    * threshold 0.95 is safe — the q34/q152 judged-at-the-exact-dial
    * pattern. Candidates-first: bucket joins carry 16-byte rows, the
    * exact re-rank runs once per deduped candidate
    * ([[graft.operators.Dedup.embeddingPairsLshBanded]]).
    */
  def q26_embed_neardup_lsh(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val twins = base.select((col("vec_id") + 100000).as("vec_id"),
      zip_with(col("v"), sequence(lit(0), lit(63)), (x, j) =>
        x + lit(0.015) *
          ((col("vec_id") * 31 + j.cast("long") * 7) % 5 - 2).cast("double")).as("v"))
    Dedup.embeddingPairsLshBanded(base.unionByName(twins), "vec_id", "v",
      dim = 64, threshold = 0.95, numPlanes = 8, tables = 24)
      .orderBy("id_a", "id_b")
  }

  /** Winnowing fingerprints (MOSS-style sliding-min sketch): per-doc
    * fingerprint cardinality for a bounded set — ORACLE-JUDGED on the
    * md5 gram-hash dial (q194's precedent: DuckDB computes the same
    * md5 hex strings, so the sliding-window min + distinct count is
    * reproducible SQL; `least` on hex strings = the same lexicographic
    * order both engines use). The production dial stays xxhash64
    * (8-byte sketches — LlmOpsSpec pins its overlap behavior); the
    * winnowing algebra is identical, only the gram hash is swapped.
    */
  def q27_fingerprints(s: SparkSession, dir: String): DataFrame =
    tWide(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"),
        size(TextFunctions.fingerprints(col("text"), k = 5, window = 4,
          gramHash = md5(_))).cast("long").as("n_fp"))
      .orderBy("doc_id")

  /** E23: dedup-by-key with deterministic keeper (streaming
    * `dropDuplicates` batch equivalent — keeps min event per key).
    */
  def q30_dedup_keyed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(min("event_id").as("first_event"), count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")

  /** Incremental dedup: drop new documents whose body already exists
    * in the historical corpus — ONE left-anti join keyed on a 128-bit
    * content hash, so the shuffle carries 24 bytes/row, never bodies.
    * (The oracle anti-joins on the text itself — identical result
    * absent a 2⁻¹²⁸ hash collision; q06's precedent.)
    */
  def q45_dedup_incremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def hashed(df: DataFrame) = df.select(
      col("doc_id"), col("lang"),
      xxhash64(col("text")).as("__h1"), xxhash64(col("text"), lit(7)).as("__h2"))
    val history = hashed(docs.filter(col("doc_id") < 250))
    val fresh = hashed(docs.filter(col("doc_id") >= 250))
    fresh.join(history, Seq("__h1", "__h2"), "left_anti")
      .groupBy("lang").agg(count(lit(1)).as("n_new"))
      .orderBy("lang")
  }

  /** Benchmark decontamination: eval docs (deterministic id slice)
    * versus the training split by shared 5-gram shingles. The join key
    * is the 8-byte shingle hash — the shuffle never carries shingle
    * strings (oracle joins the strings; identical absent a collision).
    */
  def q49_contamination(s: SparkSession, dir: String): DataFrame = {
    // explode(fused shingle-hash set) — one codegen pass per doc; the
    // exploded values are exactly xxhash64(shingle string), so the
    // join/groupBy below (order-insensitive) are unchanged.
    val sh = tWide(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.expr.ShingleExpression.shingleHashes(col("text"), 5)).as("h"))
    val evalSide = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
    val trainSide = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id").as("train_id"), col("h"))
    evalSide.join(trainSide, Seq("h"))
      .groupBy("eval_id")
      .agg(countDistinct(col("train_id")).as("n_contaminating"))
      .orderBy("eval_id")
  }

  /** Fuzzy matching: Levenshtein distance between successive customer
    * names (the record-linkage / data-cleaning primitive). Classic DP
    * gives identical integers in both engines; the pair set is a
    * deterministic id equi-join, never an all-pairs blowup.
    */
  def q70_fuzzy_match(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"))
    val b = c.select(col("c_custkey").as("id_b"), col("c_name").as("name_b"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), levenshtein(col("name_a"), col("name_b")).as("edit_dist"))
      .groupBy("edit_dist")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("edit_dist")
  }

  /** Bloom-prefiltered incremental dedup (operators/BloomDedup): which
    * docs from the non-src0 sources are textually new vs. the src0
    * corpus. The bloom routes "definitely new" rows around the exact
    * anti-join — only maybe-dupes shuffle — yet the result is exactly
    * the anti-join's, so a NOT EXISTS oracle verifies it. Compare
    * q45_dedup_incremental, the hash-anti-join-only shape.
    */
  def q80_bloom_dedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.BloomDedup
    val docs = t(s, dir, "documents")
    val corpus = docs.filter(col("source") === "src0")
    val incoming = docs.filter(col("source") =!= "src0")
    BloomDedup.newRows(incoming, corpus, "text", expectedItems = 100000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_new"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** Passage-level dedup: each doc is cut into 16-word passages; a
    * passage is kept only at its first (doc_id, idx) occurrence
    * corpus-wide — the sub-document dedup granularity real pipelines
    * use for boilerplate. Chunking is pure array arithmetic
    * (sequence/slice/array_join — codegen, no UDF); global first-wins
    * is one row_number window partitioned by passage hash.
    */
  def q83_passage_dedup(s: SparkSession, dir: String): DataFrame = {
    val chunk = 16
    val passages = tWide(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(
        transform(
          sequence(lit(0), (ceil(size(col("ws")) / lit(chunk.toDouble)) - 1).cast("int")),
          i => array_join(slice(col("ws"), i * chunk + 1, lit(chunk)), " "))))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "passage")
    val w = Window.partitionBy(col("passage")).orderBy(col("doc_id").asc, col("idx").asc)
    passages
      .withColumn("rnk", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum((col("rnk") === 1).cast("long")).as("n_kept"))
      .orderBy("doc_id")
  }

  /** k-anonymity audit over quasi-identifiers (lang, source, size
    * band): how many equivalence classes — and how many documents —
    * fall below k=5, the groups a release would have to suppress or
    * generalize. One hash agg + one tiny re-agg; the privacy gate a
    * training-corpus export runs before leaving the trust boundary.
    */
  def q92_k_anonymity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"), col("source"),
        (col("n_chars") / lit(100)).cast("long").as("size_band"))
      .agg(count(lit(1)).as("class_n"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_classes"),
        sum((col("class_n") < 5).cast("long")).as("n_small_classes"),
        sum(when(col("class_n") < 5, col("class_n")).otherwise(0L)).as("n_at_risk_docs"))
      .orderBy("lang")

  /** Exact set-similarity self-join by prefix filtering (PPJoin
    * family) over the q23 shingle sets — the deterministic-exact
    * complement to q23's MinHash-LSH candidates: same pairs ≥ θ, no
    * probabilistic signature, no all-pairs scan. See SetSimJoin for
    * the prefix theorem and the shuffle story.
    */
  def q106_setsim_prefix(s: SparkSession, dir: String): DataFrame = {
    val docs = shingle3Staged(s, dir) // staged signature table (see q36)
    graft.operators.SetSimJoin.prefixJaccardSelfJoinHashed(docs, "doc_id", "sh", 0.5)
      .select(col("id_a").as("id_a"), col("id_b").as("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** RAG-style overlapping chunking: 64-token windows at stride 32
    * (chunk i covers tokens [32i, 32i+64)), the retrieval-index
    * complement of q55's disjoint packing. Pure codegen row
    * generation — sequence/explode/slice — no shuffle at all until
    * the final presentation sort.
    */
  def q115_chunk_overlap(s: SparkSession, dir: String): DataFrame =
    tWide(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), floor((size(col("ws")) - 1) / 32))).as("chunk_no"))
      .select(col("doc_id"), col("chunk_no"),
        slice(col("ws"), (col("chunk_no") * 32 + 1).cast("int"), lit(64)).as("chunk"))
      .select(col("doc_id"), col("chunk_no"),
        size(col("chunk")).cast("long").as("n_toks"),
        element_at(col("chunk"), 1).as("first_tok"),
        element_at(col("chunk"), -1).as("last_tok"))
      .orderBy("doc_id", "chunk_no")

  /** Dataset content fingerprint for snapshot integrity audits: an
    * md5 per row over the natural key columns, bucketed by the hash's
    * first hex digit into a 16-row signature (count + min + max per
    * bucket). Order-independent (pure partial+final agg, no sort), so
    * two pipelines can compare signatures without canonicalizing row
    * order — the cheap first check before a q98-style full diff.
    */
  def q116_hash_fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(md5(concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber")).cast("binary")).as("h"))
      .groupBy(substring(col("h"), 1, 1).as("bucket"))
      .agg(count(lit(1)).as("n"), min("h").as("min_hash"), max("h").as("max_hash"))
      .orderBy("bucket")

  /** Entity resolution: blocked fuzzy best-match. Probe parts match
    * against all same-brand parts (equi-join on the blocking key — a
    * hash join, never all-pairs), scored by edit distance, best match
    * kept by (dist, partkey) rank. The blocking key bounds candidate
    * fan-out; at 100 TB the block would be (brand, container) or a
    * q84-style locality bucket.
    */
  def q120_entity_resolution(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_name"))
    val probes = p.filter(col("p_partkey") % 97 === 0)
      .select(col("p_partkey").as("qk"), col("p_brand").as("qb"),
        col("p_name").as("qn"))
    val cands = p.select(col("p_partkey").as("ck"), col("p_brand").as("cb"),
      col("p_name").as("cn"))
    probes.join(cands, col("qb") === col("cb") && col("qk") =!= col("ck"))
      .select(col("qk"), col("qn"), col("ck"), col("cn"),
        levenshtein(col("qn"), col("cn")).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qk").orderBy(col("dist"), col("ck"))))
      .filter(col("rn") === 1)
      .select(col("qk").as("p_partkey"), col("qn").as("p_name"),
        col("ck").as("match_partkey"), col("cn").as("match_name"), col("dist"))
      .orderBy("p_partkey")
  }

  /** Jaro-Winkler fuzzy matching — q120's blocked entity resolution
    * re-scored with the prefix-weighted similarity the record-linkage
    * literature prefers for short names, via the native codegen
    * expression `graft.expr.JaroWinkler` (Spark has levenshtein but no
    * Jaro-Winkler builtin; semantics pinned to DuckDB's
    * `jaro_winkler_similarity` so the oracle is definitional). Rank
    * orders by the ROUNDED score so a 1-ulp cross-engine FP difference
    * cannot flip the winner; brand blocking keeps the candidate
    * fan-out bounded exactly as in q120.
    */
  def q125_jaro_winkler(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_name"))
    val probes = p.filter(col("p_partkey") % 97 === 0)
      .select(col("p_partkey").as("qk"), col("p_brand").as("qb"),
        col("p_name").as("qn"))
    val cands = p.select(col("p_partkey").as("ck"), col("p_brand").as("cb"),
      col("p_name").as("cn"))
    probes.join(cands, col("qb") === col("cb") && col("qk") =!= col("ck"))
      .select(col("qk"), col("qn"), col("ck"), col("cn"),
        round(graft.expr.StringSimilarity.jaroWinkler(col("qn"), col("cn")), 4)
          .as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qk").orderBy(desc("sim"), col("ck"))))
      .filter(col("rn") === 1)
      .select(col("qk").as("p_partkey"), col("qn").as("p_name"),
        col("ck").as("match_partkey"), col("cn").as("match_name"), col("sim"))
      .orderBy("p_partkey")
  }

  /** Lexical diversity (type-token ratio + hapax fraction) — the
    * per-document vocabulary-richness signal quality filters use to
    * catch keyword-stuffed or template text. One explode → (doc, word)
    * count agg, then a per-doc re-agg; all-integer outputs (basis
    * points via exact long division), so no float ever crosses the
    * oracle boundary.
    */
  def q130_lexical_diversity(s: SparkSession, dir: String): DataFrame =
    tWide(s, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"), w => length(w) > 0))
          .as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        expr("n_types * 10000 div n_tokens").as("ttr_bp"),
        expr("n_hapax * 10000 div n_types").as("hapax_bp"))
      .orderBy("doc_id")

  /** Privacy audit, l-diversity (q92's k-anonymity complement, on the
    * customer table): for each quasi-identifier class (nation x
    * segment), the class size k AND the number of DISTINCT sensitive
    * values (acctbal bucket) — a class can be large (k-anonymous) yet
    * still leak if every member shares one sensitive value. Output is
    * the 5 most at-risk classes (lowest diversity, smallest first).
    */
  def q157_l_diversity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("k_size"),
        countDistinct(col("bal_bucket")).as("l_div"))
      .orderBy(col("l_div"), col("k_size"), col("c_nationkey"), col("c_mktsegment"))
      .limit(5)

  /** Flagship END-TO-END near-dup dedup pipeline — the composition a
    * training-data curation run actually executes, as ONE judged
    * query: MinHash+LSH candidate pairs (q23's machinery) → exact
    * Jaccard verify → connected components (q53's pointer-jumping) →
    * canonical-representative selection per cluster (longest doc,
    * ties to lowest id) → full-corpus accounting INCLUDING singleton
    * docs (left join + coalesce to own id — q53 only labels docs that
    * appear in an edge). Output: one row per surviving cluster with
    * its canonical doc, member count, kept and dropped token mass.
    * At 100 TB every stage is the scale-safe form: the LSH shuffle
    * carries (band_key, id, shingles) never bodies, CC checkpoints
    * per round, and the argmax window partitions by component (many
    * small groups, no global window).
    */
  def q158_dedup_pipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Components
    val docs = tWide(s, dir, "documents")
    val words = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).as("n_words"))
    val pairs = lshPairsStaged(s, dir)
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("cid"), col("component"))
    val labeled = words
      .join(comp, col("doc_id") === col("cid"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"),
        col("n_words"))
    val w = Window.partitionBy("component")
      .orderBy(col("n_words").desc, col("doc_id").asc)
    labeled.withColumn("rn", row_number().over(w))
      .groupBy("component")
      .agg(
        max(when(col("rn") === 1, col("doc_id"))).as("canonical_doc"),
        count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("n_words"))).as("kept_words"),
        sum(when(col("rn") > 1, col("n_words")).otherwise(0)).as("dropped_words"))
      .orderBy("component")
  }

  /** Cluster-scoped embedding dedup (operators/SemanticDedup — the
    * SemDeDup pattern): k-means cells via the IVF centroid build,
    * near-dup pairs searched ONLY within cells, drop the higher id of
    * each pair. Per-cell summary rows. The synthetic embeddings are
    * near-orthogonal (max off-diagonal cosine ~0.6), so tau=0.3 is
    * deliberately aggressive to exercise the drop path; the planted
    * -duplicate ground truth lives in Round5OpsSpec. Rows-only: the
    * cluster assignment is not SQL-expressible.
    */
  def q167_semantic_dedup(s: SparkSession, dir: String): DataFrame =
    operators.SemanticDedup.summary(
      tWide(s, dir, "embeddings"), "vec_id", "embedding",
      nCentroids = 16, tau = 0.3)

  /** Directional containment join (SetSimJoin.containmentJoin):
    * pairs where >= 70% of a's discriminative 3-shingles occur in b —
    * the quote/excerpt/subset-duplication detector Jaccard joins miss
    * by construction. df-capped inverted index (cap 50) bounds the
    * fan-out AND defines the score's vocabulary (stop-shingles
    * excluded from numerator and denominator alike — part of the
    * operator contract, reproduced by the oracle).
    *
    * The index (tokenize → shingle → hash → df-cap) is corpus-derived
    * and deterministic at the fixed (3, 50) dial, so it is STAGED once
    * per dataset dir (basketPairsW's pattern) — repeated runs pay one
    * columnar scan of the (a_id, sh) frame instead of rebuilding the
    * explode + df aggregation; on a cluster this is "materialize the
    * inverted index per corpus snapshot", the layout every search
    * system keeps anyway.
    */
  def q171_containment_join(s: SparkSession, dir: String): DataFrame = {
    val staged = stagedParquet(s"cidx|$dir") { out =>
      val docs = tWide(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      operators.SetSimJoin.containmentIndex(
          docs, "doc_id", "toks", shingleSize = 3, maxDf = 50L)
        .write.mode("overwrite").parquet(out)
    }
    operators.SetSimJoin.containmentJoinFromIndex(
        s.read.parquet(staged), minContainment = 0.7)
      .orderBy("a_id", "b_id")
  }

  /** Cross-document duplicated-span detection (operators/DupSpans) —
    * the n-gram-granular ExactSubstr dedup: WHERE and HOW LONG two
    * documents share verbatim passages, not just that they overlap.
    * Positional window hashes (fused codegen) → df-capped self-join →
    * gaps-and-islands per diagonal. The oracle reproduces the whole
    * contract including the df cap, joining on the window STRING
    * (Spark joins on its xxhash64 — q106's collision trade).
    */
  def q178_dup_spans(s: SparkSession, dir: String): DataFrame =
    operators.DupSpans.spans(
        tWide(s, dir, "documents"), "doc_id", "text",
        n = 8, maxDf = 20L, minSpanTokens = 20)
      .orderBy("a_id", "b_id", "a_start", "b_start")

  /** MOSS winnowing fingerprints (Schleimer et al. 2003): per doc,
    * hash every 4-token gram, then keep only the MINIMUM hash of each
    * sliding window of 8 consecutive gram hashes — the fingerprint
    * set is ~2/(w+1) of the gram set (measured 4.8× smaller here) yet
    * GUARANTEES any shared run of w+k-1 tokens yields at least one
    * shared fingerprint. That guarantee is what q23's MinHash can't
    * give (probabilistic) and what makes winnowing the
    * plagiarism-detector standard. Pairs sharing >= 3 fingerprints.
    *
    * Scale shape: gram hashing + window mins are ONE narrow codegen
    * map (transform/array_min over per-row arrays, no shuffle); only
    * the ~5×-compressed fingerprint set reaches the self-join, which
    * shuffles on the fingerprint value — the same join a full-gram
    * index would do, on a fifth of the rows. Fingerprints persisted
    * once (both join sides). Hashes are md5 hex strings: their
    * lexicographic min is engine-identical, which is what makes the
    * whole operator DuckDB-oracle-checkable. A boilerplate-hot
    * fingerprint skews the join like any inverted index — the q171
    * df-cap contract applies at corpus scale; AQE skew-join covers
    * the moderate case.
    */
  def q194_winnowing(s: SparkSession, dir: String): DataFrame = {
    val K = 4 // gram size (tokens)
    val W = 8 // winnowing window (grams)
    val grams = tWide(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= K)
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("ws")) - (K - 1)),
          i => md5(concat_ws(" ", slice(col("ws"), i, lit(K))))).as("hs"))
    val fps = grams.select(col("doc_id"),
        explode(when(size(col("hs")) >= W,
          transform(sequence(lit(1), size(col("hs")) - (W - 1)),
            i => array_min(slice(col("hs"), i, lit(W)))))
          .otherwise(array(array_min(col("hs"))))).as("fp"))
      .distinct()
      .persistTracked()
    fps.select(col("doc_id").as("doc_a"), col("fp"))
      .join(fps.select(col("doc_id").as("doc_b"), col("fp")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
      .orderBy(desc("shared"), col("doc_a"), col("doc_b"))
  }

  /** Fuzzy record linkage with blocking: near-identical part names
    * (levenshtein <= 3) found WITHOUT the all-pairs comparison — names
    * are blocked on their last word and only within-block pairs are
    * scored. The classic Fellegi-Sunter blocking contract: the block
    * key bounds the quadratic to block-size², and the edit-distance
    * scorer only ever sees candidate pairs. Scale shape: dedup the
    * name dimension first (distinct), shuffle on the block key, score
    * inside each block; a skewed block is AQE's skew-join case, and a
    * production blocker composes several cheap keys (first word, size,
    * soundex) the same way. `levenshtein` is codegen'd — no UDF.
    */
  def q195_fuzzy_linkage(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part").select("p_name").distinct()
    val blocked = names.select(col("p_name"),
      element_at(split(col("p_name"), " "), -1).as("blk"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
      .orderBy("dist", "name_a", "name_b")
  }

  /** Sorted-neighborhood dedup (Hernández & Stolfo 1995): sort the
    * entity names, compare each record only to its w=5 successors in
    * sort order, keep levenshtein ≤ 3 — the OTHER classic bounded-
    * comparison record-linkage method next to q195's key blocking
    * (blocking misses cross-block typos in the block key itself;
    * SNM misses only pairs > w apart in sort order — production ER
    * runs both and unions). The global sort position comes from the
    * cost-based PrefixSum.globalRank (never a single-partition window);
    * the "±w neighbors" join is an EQUI-join on rank after a 5-way
    * offset explode — w× replication of a name-sized frame instead of
    * a range join, so it co-partitions at any scale.
    */
  def q214_sorted_neighborhood(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val w = 5
    val names = t(s, dir, "part").select("p_name").distinct()
    val ranked = PrefixSum.globalRank(names, Seq("p_name"), "r")
    val probes = ranked.select(col("p_name").as("name_a"),
        explode(sequence(lit(1), lit(w))).as("off"), col("r"))
      .withColumn("r", col("r") + col("off"))
    probes.join(ranked.select(col("p_name").as("name_b"), col("r")), "r")
      .filter(levenshtein(col("name_a"), col("name_b")) <= 3)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .orderBy("dist", "name_a", "name_b")
  }

  /** Golden-record construction (survivorship): after q195/q214 decide
    * which records co-refer, FUSE each block into one canonical row —
    * modal brand (most frequent, ties lexicographic), max price, min
    * key as the surviving id. The mode is a two-level aggregate (count
    * per (block, value) → rank-1 per block), never a collect; all
    * per-block frames are block-cardinality-sized. The survivorship
    * policy is the deterministic part of ER that SQL CAN express —
    * which is exactly why it is the judged half (q195's match scoring
    * already covers the fuzzy half).
    */
  def q218_golden_record(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val brandCounts = parts.groupBy("blk", "p_brand").agg(count(lit(1)).as("bc"))
    val modal = brandCounts
      .withColumn("rk", row_number().over(
        Window.partitionBy("blk").orderBy(col("bc").desc, col("p_brand").asc)))
      .filter(col("rk") === 1)
      .select(col("blk"), col("p_brand").as("modal_brand"), col("bc").as("brand_support"))
    parts.groupBy("blk")
      .agg(count(lit(1)).as("n_records"),
        min("p_partkey").as("surviving_key"),
        round(max("p_retailprice"), 2).as("max_price"))
      .join(modal, "blk")
      .select("blk", "n_records", "surviving_key", "modal_brand", "brand_support", "max_price")
      .orderBy("blk")
  }

  /** Exact-duplicate rate by source — the per-provider curation
    * dashboard number that decides which feed gets the dedup budget
    * (a 30% dup-rate crawl and a clean API feed should not share a
    * pipeline config). Content identity = md5 of the body (the q06
    * key), counted DISTINCT per source in one aggregate; rate is one
    * exact-integer division.
    */
  def q251_dup_rate_by_source(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(md5(col("text"))).as("n_unique"))
      .withColumn("dup_rate",
        round((col("n_docs") - col("n_unique")) / col("n_docs"), 4))
      .orderBy("source")

  def q304_edit_join(s: SparkSession, dir: String): DataFrame = {
    val d = 2
    val groups = t(s, dir, "part")
      .select(col("p_name").as("name"))
      .groupBy("name").agg(count(lit(1)).as("cnt"))
    val cross = editPairsNameGrain(groups.select("name"), d)
      .filter(col("dist") >= 1)
      .join(groups.select(col("name").as("na"), col("cnt").as("ma")), "na")
      .join(groups.select(col("name").as("nb"), col("cnt").as("mb")), "nb")
      .select(col("dist"), (col("ma") * col("mb")).as("pairs"))
    val within = groups
      .select(lit(0L).as("dist"), expr("(cnt * (cnt - 1)) div 2").as("pairs"))
    cross.unionAll(within)
      .groupBy("dist").agg(sum("pairs").as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy("dist")
  }

  /** Blocking-quality audit: q214's window-5 sorted-neighborhood
    * blocking scored against the EXACT edit-distance-≤2 truth (the
    * lossless q304 machinery) — the reduction-ratio / pair-completeness
    * readout every record-linkage pipeline needs before trusting a
    * blocking key (RR says how much of the n² the block avoided; PC
    * says how much recall it paid for that). Both pair sets live at
    * the distinct-name grain: truth from the prefix-filtered verify,
    * candidates from rank-adjacency (r+1..r+5 equi-joins over
    * [[PrefixSum.globalRank]] — never a windowed self-cross), the
    * intersection one more equi-join. All counts exact integers; the
    * two ratios are single divisions rounded once.
    */
  def q307_blocking_quality(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val w = 5
    val names = t(s, dir, "part").select(col("p_name").as("name")).distinct()
    val truth = editPairsNameGrain(names, 2).select("na", "nb")
    val ranked = PrefixSum.globalRank(names, Seq("name"), "r")
    val cand = ranked.select(col("name").as("na"),
        explode(sequence(lit(1), lit(w))).as("off"), col("r"))
      .withColumn("r", col("r") + col("off"))
      .join(ranked.select(col("name").as("nb"), col("r")), "r")
      .select("na", "nb")
    val caught = truth.join(cand, Seq("na", "nb"), "left_semi")
    val nNames = names.agg(count(lit(1)).as("n_names"))
    val counts = nNames
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
      .crossJoin(broadcast(caught.agg(count(lit(1)).as("n_caught"))))
    counts.select(col("n_names"), col("n_truth"), col("n_cand"), col("n_caught"),
      round(lit(1.0) - col("n_cand") /
        (col("n_names") * (col("n_names") - 1L) / lit(2.0)), 6).as("reduction_ratio"),
      when(col("n_truth") > 0,
        round(col("n_caught") / col("n_truth").cast("double"), 6)).as("pair_completeness"))
  }

  /** Cross-corpus NEAR-DUP decontamination (the Dolma/RefinedWeb step
    * q49's exact n-gram overlap can't do): training docs that
    * near-duplicate any benchmark doc at shingle-Jaccard ≥ 0.5, found
    * by the ASYMMETRIC LSH band join ([[Dedup.minhashLshPairsCross]]) —
    * benchmark bands probe training bands only, so candidates scale
    * with |benchmark|·collisions instead of |train|² (a paraphrased or
    * lightly-edited test document sails through exact-match decon;
    * MinHash catches it). The benchmark set is the deterministic
    * doc_id % 10 == 5 slice — a 10% eval holdout that the planted
    * near-dup pairs actually straddle at every SF (q49's %97 slice
    * misses all of them, which would judge an empty frame). Output is
    * the curation report:
    * per-source contaminated-doc and pair counts. The exact all-pairs
    * SQL oracle is safe for the same reason as q23: planted near-dups
    * sit at jaccard ≥ 0.9 with nothing in (0.1, 0.9), so LSH recall
    * here is 1 − ~1e-11.
    */
  def q336_lsh_decontamination(s: SparkSession, dir: String): DataFrame = {
    val docs = tWide(s, dir, "documents")
    val pairs = operators.Dedup.minhashLshPairsCross(
      docs.filter(col("doc_id") % 10 === 5),
      docs.filter(col("doc_id") % 10 =!= 5),
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
      threshold = 0.5)
    pairs
      .join(t(s, dir, "documents").select(col("doc_id").as("id_r"), col("source")),
        Seq("id_r"))
      .groupBy("source")
      .agg(countDistinct(col("id_r")).as("n_contaminated"),
        count(lit(1)).as("n_pairs"))
      .orderBy("source")
  }

  /** ORACLE-JUDGED SimHash (q24's md5 twin — the q27/q194 hash-swap
    * pattern applied to the last hash-sketch family member): 32-bit
    * SimHash fingerprints whose per-token hash is the first 8 hex
    * chars of md5, so DuckDB rebuilds the identical fingerprints with
    * positional hex arithmetic + integer bit ops and the pairwise
    * Hamming histogram is hash-exact. Same bounded 50-doc probe frame
    * as q24 (the documented crossJoin allowlist case — ≤C(50,2) pairs,
    * never corpus-quadratic); empty-token docs fingerprint to 0 in
    * both engines. xxhash64 (q24) stays the 64-bit production dial —
    * this judges the ALGEBRA (counters, sign bits, Hamming) exactly.
    */
  def q357_simhash_md5(s: SparkSession, dir: String): DataFrame = {
    val fps = t(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        TextFunctions.simhashMd5_32(TextFunctions.tokens(col("text"))).as("fp"))
    val a = fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(TextFunctions.hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming")
  }

  /** SemDeDup judged at the EXACT dial (k = 1 cell): with a single
    * centroid the within-cell pair search degenerates to the exact
    * all-pairs join, so the WHOLE SemanticDedup algebra — normalize,
    * assign, within-cell pair filter at tau, drop-the-higher-id,
    * per-cell rollup — becomes SQL-expressible and DuckDB-judged
    * (q25's all-pairs precedent; q34/q152's judged-at-the-exact-dial
    * pattern). The production dial (k = 16 cells, q167) stays
    * rows-only because the k-means cell assignment is not
    * SQL-expressible; THIS query pins every other stage of the
    * operator against the oracle. Quadratic by definition and the
    * single-cell join runs on one key — the verification baseline,
    * deliberately NOT the scale path (that is q167's bounded cells /
    * q26's banded LSH). Measured corpus margin min|cos−0.3| ≥ 5.8e-7
    * at every SF — eight orders above the ~1e-15 relative rounding
    * the two engines' different association orders can produce, so
    * the float boundary cannot flip a pair. The cell LABEL is the
    * hash-sampled seed's vec_id (engine-internal, like q167's
    * assignment), so the judged projection rolls the cells up —
    * at k = 1 that loses nothing: (n_cells, n_vecs, n_dropped) pins
    * the whole drop set.
    */
  def q359_semdedup_exact(s: SparkSession, dir: String): DataFrame =
    operators.SemanticDedup.summary(
      tWide(s, dir, "embeddings"), "vec_id", "embedding",
      nCentroids = 1, tau = 0.3)
      .agg(count(lit(1)).as("n_cells"), sum("n_vecs").as("n_vecs"),
        sum("n_dropped").as("n_dropped"))

  /** Bounded-bucket LSH dedup contract (the round-13 adversarial-
    * duplication guard, Dedup.minhashLshPairsBounded) judged at the
    * EXACT dial. Planted corpus, reproducible in SQL: every 100th doc
    * seeds a duplicate cluster — exact copies of its text under fresh
    * ids (10_000_000 + doc_id·100 + k) — of size 21 for every 200th
    * doc (ABOVE the maxBucket=8 cap → the guard emits the STAR:
    * hub = min id = the seed, one pair per copy) and size 5 otherwise
    * (below the cap → classic all-pairs). threshold=1.0 makes the
    * verified output exactly the identical-token-stream structure:
    * exact copies have shingle-Jaccard exactly 1.0, while the highest
    * NON-identical background pair measures 97/98 ≈ 0.9898 at sf0.1
    * (two word-salad docs one shingle apart) — a 4-decimal round
    * can only reach 1.0 from a true Jaccard ≥ 0.99995, i.e. ≥ 20k
    * shingles per doc, two orders beyond this corpus — so stray band
    * collisions die in the verify stage and the result is
    * deterministic cluster algebra DuckDB reproduces without MinHash.
    * The oracle also carries the corpus's NATURAL exact-duplicate
    * texts (8 background pairs at sf0.1, none seed-adjacent): their
    * size-2 token-stream groups sit below the cap and emit as
    * ordinary all-pairs.
    * At 100 TB this query IS the adversarial case the guard exists
    * for: a mirror-site flood puts 20+ copies in every band bucket,
    * and the star keeps candidate emission linear in cluster size
    * while connected-components downstream still reassembles the full
    * cluster through the hub.
    */
  def q370_lsh_bounded(s: SparkSession, dir: String): DataFrame = {
    val docs = tWide(s, dir, "documents").select(col("doc_id"), col("text"))
    val seeds = docs.filter(col("doc_id") % 100 === 0)
    val copies = seeds
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          when(col("doc_id") % 200 === 0, lit(20)).otherwise(lit(4)))).as("k"))
      .select((lit(10000000L) + col("doc_id") * 100 + col("k")).as("doc_id"),
        col("text"))
    Dedup.minhashLshPairsBounded(docs.unionByName(copies), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8,
        threshold = 1.0, maxBucket = 8)
      .orderBy("id_a", "id_b")
  }

  /** Bounded-bucket guard for the EMBEDDING LSH family
    * (Dedup.embeddingPairsLshBandedBounded — q26's operator under the
    * round-13 adversarial rule), judged at the exact dial. Planting
    * differs from q370 in two deliberate ways that make the star
    * output deterministic under ARBITRARY background bucket
    * cohabitation (hyperplane buckets are coarse — 2^8 per table —
    * so background vectors share cluster buckets routinely, unlike
    * minhash band keys):
    *
    *  - copies carry NEGATIVE ids (-(seed·100+k)), below every
    *    background id, so ANY bucket containing cluster members has
    *    the cluster's own most-negative copy as its min-id hub — the
    *    star's source never depends on which background vectors
    *    happen to cohabit;
    *  - maxBucket=4 sits BELOW the small cluster size (5), so every
    *    cluster bucket overflows in every table and the star path is
    *    the only emitter for planted pairs (sub-cap all-pairs is
    *    judged by q370 and pinned by AdversarialDedupSpec).
    *
    * Every planted vector is an EXACT copy of its seed: verified
    * cosine is exactly 1.0 while the background tops out at 0.513
    * (measured, sf0.01) — stray candidates die at the threshold and
    * the output is pure cluster algebra: hub → {19 copies + seed}
    * for the 21-member clusters, hub → {3 copies + seed} for the
    * 5-member ones. Cross-cluster bucket sharing cannot suppress a
    * cluster's star: that would need the two distinct seed vectors to
    * collide in ALL 24 tables (p ≈ 0.042²⁴ at their ≤0.513 cosine).
    */
  def q371_embed_lsh_bounded(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val seeds = base.filter(col("vec_id") % 100 === 0)
    val copies = seeds
      .select(col("vec_id"), col("v"),
        explode(sequence(lit(1),
          when(col("vec_id") % 200 === 0, lit(20)).otherwise(lit(4)))).as("k"))
      .select((-(col("vec_id") * 100 + col("k"))).as("vec_id"), col("v"))
    Dedup.embeddingPairsLshBandedBounded(base.unionByName(copies), "vec_id", "v",
        dim = 64, threshold = 1.0, numPlanes = 8, tables = 24, maxBucket = 4)
      .orderBy("id_a", "id_b")
  }

  private[graft] def dedupAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q370_lsh_bounded"  -> (q370_lsh_bounded _),
    "q371_embed_lsh_bounded" -> (q371_embed_lsh_bounded _),
    "q06_dedup_exact"   -> (q06_dedup_exact _),
    "q23_dedup_minhash" -> (q23_dedup_minhash _),
    "q24_simhash_hamming" -> (q24_simhash_hamming _),
    "q26_embed_neardup_lsh" -> (q26_embed_neardup_lsh _),
    "q27_fingerprints"  -> (q27_fingerprints _),
    "q30_dedup_keyed"   -> (q30_dedup_keyed _),
    "q45_dedup_incremental" -> (q45_dedup_incremental _),
    "q49_contamination" -> (q49_contamination _),
    "q70_fuzzy_match"   -> (q70_fuzzy_match _),
    "q80_bloom_dedup"   -> (q80_bloom_dedup _),
    "q83_passage_dedup" -> (q83_passage_dedup _),
    "q92_k_anonymity"   -> (q92_k_anonymity _),
    "q106_setsim_prefix" -> (q106_setsim_prefix _),
    "q115_chunk_overlap" -> (q115_chunk_overlap _),
    "q116_hash_fingerprint" -> (q116_hash_fingerprint _),
    "q120_entity_resolution" -> (q120_entity_resolution _),
    "q125_jaro_winkler" -> (q125_jaro_winkler _),
    "q130_lexical_diversity" -> (q130_lexical_diversity _),
    "q157_l_diversity"  -> (q157_l_diversity _),
    "q158_dedup_pipeline" -> (q158_dedup_pipeline _),
    "q167_semantic_dedup" -> (q167_semantic_dedup _),
    "q171_containment_join" -> (q171_containment_join _),
    "q178_dup_spans"    -> (q178_dup_spans _),
    "q194_winnowing"    -> (q194_winnowing _),
    "q195_fuzzy_linkage" -> (q195_fuzzy_linkage _),
    "q214_sorted_neighborhood" -> (q214_sorted_neighborhood _),
    "q218_golden_record" -> (q218_golden_record _),
    "q251_dup_rate_by_source" -> (q251_dup_rate_by_source _),
    "q304_edit_join"    -> (q304_edit_join _),
    "q307_blocking_quality" -> (q307_blocking_quality _),
    "q336_lsh_decontamination" -> (q336_lsh_decontamination _),
    "q357_simhash_md5" -> (q357_simhash_md5 _),
    "q359_semdedup_exact" -> (q359_semdedup_exact _),
  )

  private[graft] def dedupOracle: Map[String, String] = Map(
    "q370_lsh_bounded" ->
      """WITH seeds AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 100 = 0),
        |big AS (  -- cluster size 21 > cap 8: star from the hub (seed)
        |  SELECT s.doc_id AS id_a,
        |         10000000 + s.doc_id * 100 + k.i AS id_b
        |  FROM seeds s, range(1, 21) k(i)
        |  WHERE s.doc_id % 200 = 0),
        |small_members AS (  -- cluster size 5 <= cap 8: all pairs
        |  SELECT s.doc_id AS seed, k.i,
        |         CASE WHEN k.i = 0 THEN s.doc_id
        |              ELSE 10000000 + s.doc_id * 100 + k.i END AS id
        |  FROM seeds s, range(0, 5) k(i)
        |  WHERE s.doc_id % 200 <> 0),
        |small AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM small_members a JOIN small_members b
        |    ON a.seed = b.seed AND a.i < b.i),
        |d AS (  -- natural exact-dup token streams in the background
        |  SELECT doc_id, array_to_string(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> t <> ''), ' ') AS norm,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |                    t -> t <> '')) AS ntok
        |  FROM documents),
        |nat AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM d a JOIN d b
        |    ON a.norm = b.norm AND a.doc_id < b.doc_id
        |  WHERE a.ntok >= 3)
        |SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS jaccard FROM big
        |UNION ALL
        |SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS jaccard FROM small
        |UNION ALL
        |SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS jaccard FROM nat
        |ORDER BY id_a, id_b""".stripMargin,
    "q371_embed_lsh_bounded" ->
      """WITH seeds AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id % 100 = 0),
        |big AS (  -- 21-member cluster: star from the most-negative copy
        |  SELECT -(s.vec_id * 100 + 20) AS id_a,
        |         CASE WHEN k.i = 0 THEN s.vec_id
        |              ELSE -(s.vec_id * 100 + k.i) END AS id_b
        |  FROM seeds s, range(0, 20) k(i)
        |  WHERE s.vec_id % 200 = 0),
        |small AS (  -- 5-member cluster: cap 4 < 5, still the star
        |  SELECT -(s.vec_id * 100 + 4) AS id_a,
        |         CASE WHEN k.i = 0 THEN s.vec_id
        |              ELSE -(s.vec_id * 100 + k.i) END AS id_b
        |  FROM seeds s, range(0, 4) k(i)
        |  WHERE s.vec_id % 200 <> 0)
        |SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS cosine FROM big
        |UNION ALL
        |SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS cosine FROM small
        |ORDER BY id_a, id_b""".stripMargin,
    "q06_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dupes
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q23_dedup_minhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |                   for i in range(1, len(toks) - 1)]) AS sh
        |  FROM d WHERE len(toks) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        |FROM s a, s b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_intersect(a.sh, b.sh))::DOUBLE /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q359_semdedup_exact" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |d AS (
        |  SELECT count(DISTINCT b.vec_id) AS n_dropped
        |  FROM e a, e b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.3)
        |SELECT 1::BIGINT AS n_cells, (SELECT count(*) FROM e) AS n_vecs, d.n_dropped
        |FROM d ORDER BY n_cells""".stripMargin,
    "q357_simhash_md5" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
        |tk AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM d),
        |hv AS (SELECT doc_id,
        |    ((strpos('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 268435456
        |   + (strpos('0123456789abcdef', substring(md5(tok), 2, 1)) - 1) * 16777216
        |   + (strpos('0123456789abcdef', substring(md5(tok), 3, 1)) - 1) * 1048576
        |   + (strpos('0123456789abcdef', substring(md5(tok), 4, 1)) - 1) * 65536
        |   + (strpos('0123456789abcdef', substring(md5(tok), 5, 1)) - 1) * 4096
        |   + (strpos('0123456789abcdef', substring(md5(tok), 6, 1)) - 1) * 256
        |   + (strpos('0123456789abcdef', substring(md5(tok), 7, 1)) - 1) * 16
        |   + (strpos('0123456789abcdef', substring(md5(tok), 8, 1)) - 1))::BIGINT AS h
        |  FROM tk WHERE tok <> ''),
        |bt AS (SELECT doc_id, b.b AS b,
        |    sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS c
        |  FROM hv, range(0, 32) b(b) GROUP BY 1, 2),
        |fp0 AS (SELECT doc_id,
        |    sum(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS fp
        |  FROM bt GROUP BY 1),
        |fp AS (SELECT d.doc_id, coalesce(fp0.fp, 0) AS fp
        |  FROM d LEFT JOIN fp0 USING (doc_id)),
        |pr AS (SELECT bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
        |  FROM fp a, fp b WHERE a.doc_id < b.doc_id)
        |SELECT hamming, count(*)::BIGINT AS n_pairs
        |FROM pr GROUP BY 1 ORDER BY hamming""".stripMargin,
    "q27_fingerprints" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
        |  WHERE doc_id < 100),
        |g AS (SELECT doc_id, unnest(range(1, greatest(len(t) - 3, 1))) AS i, t
        |  FROM d),
        |g2 AS (SELECT doc_id, i, md5(substring(t, i::INT, 5)) AS h FROM g),
        |w AS (SELECT doc_id, i,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM g2),
        |f AS (SELECT doc_id, count(DISTINCT mh) AS n_fp
        |  FROM w WHERE i <= n - 3 GROUP BY 1)
        |SELECT d.doc_id, coalesce(f.n_fp, 0)::BIGINT AS n_fp
        |FROM d LEFT JOIN f USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q26_embed_neardup_lsh" ->
      """WITH e0 AS (SELECT vec_id AS oid, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |tw AS (SELECT oid + 100000 AS vec_id,
        |    list_transform(list_zip(v, range(0, len(v))),
        |      z -> z[1] + 0.015 * ((oid*31 + z[2]*7) % 5 - 2)) AS v
        |  FROM e0),
        |e AS (SELECT oid AS vec_id, v FROM e0 UNION ALL SELECT vec_id, v FROM tw),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.v, b.v) /
        |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
        |      AS cosine
        |  FROM e a, e b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM p
        |WHERE cosine >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,
    "q30_dedup_keyed" ->
      """SELECT user_id, event_type, min(event_id) AS first_event, count(*) AS n
        |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "q45_dedup_incremental" ->
      """SELECT lang, count(*) AS n_new
        |FROM documents n
        |WHERE doc_id >= 250 AND NOT EXISTS (
        |  SELECT 1 FROM documents h WHERE h.doc_id < 250 AND h.text = n.text)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q49_contamination" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
        |                          for i in range(1, len(toks) - 3)])) AS sh
        |  FROM d WHERE len(toks) >= 5)
        |SELECT e.doc_id AS eval_id, count(DISTINCT t.doc_id) AS n_contaminating
        |FROM s e JOIN s t ON e.sh = t.sh AND t.doc_id % 97 <> 0
        |WHERE e.doc_id % 97 = 0
        |GROUP BY e.doc_id ORDER BY eval_id""".stripMargin,
    "q70_fuzzy_match" ->
      """SELECT levenshtein(a.c_name, b.c_name) AS edit_dist, count(*) AS n_pairs
        |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
        |GROUP BY 1 ORDER BY edit_dist""".stripMargin,
    "q80_bloom_dedup" ->
      """SELECT source, count(*) AS n_new, sum(n_chars)::BIGINT AS sum_chars
        |FROM documents d
        |WHERE source <> 'src0'
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.source = 'src0' AND c.text = d.text)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q83_passage_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, ws,
        |    unnest(range(0, cast(ceil(len(ws) / 16.0) AS INT))) AS idx FROM w),
        |p AS (SELECT doc_id, idx,
        |    array_to_string(ws[idx*16+1 : idx*16+16], ' ') AS passage FROM c),
        |r AS (SELECT doc_id, idx, passage,
        |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx) AS rnk
        |  FROM p)
        |SELECT doc_id, count(*) AS n_passages,
        |  sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q92_k_anonymity" ->
      """WITH cls AS (
        |  SELECT lang, source, n_chars // 100 AS size_band, count(*) AS class_n
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, count(*) AS n_classes,
        |  sum(CASE WHEN class_n < 5 THEN 1 ELSE 0 END)::BIGINT AS n_small_classes,
        |  sum(CASE WHEN class_n < 5 THEN class_n ELSE 0 END)::BIGINT AS n_at_risk_docs
        |FROM cls GROUP BY lang ORDER BY lang""".stripMargin,
    "q106_setsim_prefix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |                   for i in range(1, len(toks) - 1)]) AS sh
        |  FROM d WHERE len(toks) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        |FROM s a, s b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_intersect(a.sh, b.sh))::DOUBLE /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q115_chunk_overlap" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |c AS (SELECT doc_id,
        |        unnest(range(0, ((len(ws) - 1) // 32) + 1)) AS chunk_no, ws
        |      FROM w WHERE len(ws) > 0),
        |s AS (SELECT doc_id, chunk_no,
        |        ws[chunk_no * 32 + 1 : least(chunk_no * 32 + 64, len(ws))] AS chunk
        |      FROM c)
        |SELECT doc_id, chunk_no, len(chunk) AS n_toks,
        |  chunk[1] AS first_tok, chunk[len(chunk)] AS last_tok
        |FROM s ORDER BY doc_id, chunk_no""".stripMargin,
    "q116_hash_fingerprint" ->
      """WITH h AS (
        |  SELECT md5(concat_ws('|', l_orderkey, l_partkey, l_suppkey,
        |                       l_linenumber)) AS h
        |  FROM lineitem)
        |SELECT substr(h, 1, 1) AS bucket, count(*) AS n,
        |  min(h) AS min_hash, max(h) AS max_hash
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q120_entity_resolution" ->
      """WITH probes AS (
        |  SELECT p_partkey AS qk, p_brand AS qb, p_name AS qn
        |  FROM part WHERE p_partkey % 97 = 0),
        |sc AS (SELECT qk, qn, p.p_partkey AS ck, p.p_name AS cn,
        |         levenshtein(qn, p.p_name) AS dist,
        |         row_number() OVER (PARTITION BY qk
        |           ORDER BY levenshtein(qn, p.p_name), p.p_partkey) AS rn
        |       FROM probes JOIN part p
        |         ON p.p_brand = probes.qb AND p.p_partkey <> probes.qk)
        |SELECT qk AS p_partkey, qn AS p_name, ck AS match_partkey,
        |  cn AS match_name, dist
        |FROM sc WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "q125_jaro_winkler" ->
      """WITH probes AS (
        |  SELECT p_partkey AS qk, p_brand AS qb, p_name AS qn
        |  FROM part WHERE p_partkey % 97 = 0),
        |scored AS (
        |  SELECT qk, qn, c.p_partkey AS ck, c.p_name AS cn,
        |    round(jaro_winkler_similarity(qn, c.p_name), 4) AS sim
        |  FROM probes JOIN part c ON qb = c.p_brand AND qk <> c.p_partkey)
        |SELECT qk AS p_partkey, qn AS p_name, ck AS match_partkey,
        |  cn AS match_name, sim
        |FROM (SELECT *, row_number()
        |        OVER (PARTITION BY qk ORDER BY sim DESC, ck) AS rn
        |      FROM scored)
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "q130_lexical_diversity" ->
      """WITH wc AS (
        |  SELECT doc_id, w, count(*) AS c FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                         t -> t <> '')) AS w
        |    FROM documents) GROUP BY doc_id, w)
        |SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_types,
        |  ((count(*) * 10000) // sum(c))::BIGINT AS ttr_bp,
        |  ((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT
        |    AS hapax_bp
        |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q157_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS k_size,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_div
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY l_div, k_size, c_nationkey, c_mktsegment
        |LIMIT 5""".stripMargin,
    "q158_dedup_pipeline" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |words AS (SELECT doc_id, len(toks) AS n_words FROM tok),
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
        |labeled AS (
        |  SELECT w.doc_id, coalesce(c.component, w.doc_id) AS component, w.n_words
        |  FROM words w LEFT JOIN comp c ON c.id = w.doc_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY component ORDER BY n_words DESC, doc_id ASC) AS rn
        |  FROM labeled)
        |SELECT component,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
        |  count(*) AS n_members,
        |  max(CASE WHEN rn = 1 THEN n_words END) AS kept_words,
        |  sum(CASE WHEN rn > 1 THEN n_words ELSE 0 END)::BIGINT AS dropped_words
        |FROM ranked GROUP BY component ORDER BY component""".stripMargin,
    "q171_containment_join" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |docs AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 3),
        |s AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                        for i in range(1, len(toks)-1)])) AS sh
        |  FROM docs),
        |f AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= 50),
        |idx AS (SELECT s.doc_id, s.sh FROM s JOIN f USING (sh)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS n_common
        |  FROM idx a JOIN idx b USING (sh)
        |  WHERE a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, n_common,
        |  round(n_common * 1.0 / sz, 4) AS containment
        |FROM pairs JOIN sizes ON a_id = doc_id
        |WHERE n_common * 1.0 / sz >= 0.7
        |ORDER BY a_id, b_id""".stripMargin,
    "q178_dup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest([{'pos': i-1, 'w': array_to_string(toks[i:i+7], ' ')} for i in range(1, len(toks)-6)]) AS pw
        |  FROM d WHERE len(toks) >= 8),
        |s AS (SELECT doc_id, pw.pos AS pos, pw.w AS w FROM g),
        |f AS (SELECT w FROM s GROUP BY w HAVING count(*) <= 20),
        |i2 AS (SELECT s.doc_id, s.pos, s.w FROM s JOIN f USING (w)),
        |m AS (SELECT a.doc_id a_id, b.doc_id b_id, a.pos pa, b.pos pb
        |      FROM i2 a JOIN i2 b USING (w) WHERE a.doc_id < b.doc_id),
        |r AS (SELECT *, pa - row_number() OVER (PARTITION BY a_id, b_id, pa - pb ORDER BY pa) AS rk FROM m)
        |SELECT a_id, b_id, min(pa)::BIGINT AS a_start, min(pb)::BIGINT AS b_start,
        |  (count(*) + 7)::BIGINT AS span_tokens
        |FROM r GROUP BY a_id, b_id, pa - pb, rk
        |HAVING count(*) + 7 >= 20
        |ORDER BY a_id, b_id, a_start, b_start""".stripMargin,
    "q194_winnowing" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    [md5(array_to_string(ws[i:i+3], ' ')) for i in range(1, len(ws)-2)] AS hs
        |  FROM d WHERE len(ws) >= 4),
        |f AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(hs) >= 8
        |    THEN [list_min(hs[i:i+7]) for i in range(1, len(hs)-6)]
        |    ELSE [list_min(hs)] END) AS fp FROM g)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY shared DESC, doc_a, doc_b""".stripMargin,
    "q195_fuzzy_linkage" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |  levenshtein(a.p_name, c.p_name)::BIGINT AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) <= 3
        |ORDER BY dist, name_a, name_b""".stripMargin,
    "q214_sorted_neighborhood" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |ranked AS (SELECT p_name,
        |    row_number() OVER (ORDER BY p_name)::BIGINT AS r FROM names)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  levenshtein(a.p_name, b.p_name)::BIGINT AS dist
        |FROM ranked a JOIN ranked b
        |  ON b.r BETWEEN a.r + 1 AND a.r + 5
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY dist, name_a, name_b""".stripMargin,
    "q218_golden_record" ->
      """WITH parts AS (SELECT *, string_split(p_name, ' ')[-1] AS blk FROM part),
        |bc AS (SELECT blk, p_brand, count(*)::BIGINT AS bc
        |       FROM parts GROUP BY blk, p_brand),
        |modal AS (SELECT blk, p_brand AS modal_brand, bc AS brand_support
        |  FROM (SELECT *, row_number() OVER (PARTITION BY blk
        |          ORDER BY bc DESC, p_brand ASC) AS rk FROM bc)
        |  WHERE rk = 1)
        |SELECT p.blk, count(*)::BIGINT AS n_records,
        |  min(p_partkey)::BIGINT AS surviving_key,
        |  any_value(modal_brand) AS modal_brand,
        |  any_value(brand_support)::BIGINT AS brand_support,
        |  round(max(p_retailprice), 2) AS max_price
        |FROM parts p JOIN modal m ON p.blk = m.blk
        |GROUP BY p.blk ORDER BY p.blk""".stripMargin,
    "q251_dup_rate_by_source" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  count(DISTINCT md5(text))::BIGINT AS n_unique,
        |  round((count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*), 4)
        |    AS dup_rate
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q304_edit_join" ->
      """WITH n AS (SELECT p_partkey AS id, p_name AS name FROM part),
        |pr AS (SELECT levenshtein(a.name, b.name)::BIGINT AS dist
        |  FROM n a JOIN n b ON a.id < b.id
        |    AND abs(len(a.name) - len(b.name)) <= 2)
        |SELECT dist, count(*)::BIGINT AS n_pairs FROM pr
        |WHERE dist <= 2 GROUP BY dist ORDER BY dist""".stripMargin,
    "q307_blocking_quality" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |truth AS (SELECT a.name AS na, b.name AS nb
        |  FROM names a JOIN names b ON a.name < b.name
        |    AND abs(len(a.name) - len(b.name)) <= 2
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |ranked AS (SELECT name,
        |    row_number() OVER (ORDER BY name)::BIGINT AS r FROM names),
        |cand AS (SELECT a.name AS na, b.name AS nb
        |  FROM ranked a JOIN ranked b
        |    ON b.r > a.r AND b.r <= a.r + 5),
        |caught AS (SELECT * FROM truth WHERE (na, nb) IN
        |  (SELECT (na, nb) FROM cand)),
        |c AS (SELECT
        |  (SELECT count(*) FROM names)::BIGINT AS n_names,
        |  (SELECT count(*) FROM truth)::BIGINT AS n_truth,
        |  (SELECT count(*) FROM cand)::BIGINT AS n_cand,
        |  (SELECT count(*) FROM caught)::BIGINT AS n_caught)
        |SELECT n_names, n_truth, n_cand, n_caught,
        |  round(1.0 - n_cand / (n_names * (n_names - 1) / 2.0), 6)
        |    AS reduction_ratio,
        |  CASE WHEN n_truth > 0
        |    THEN round(n_caught / n_truth::DOUBLE, 6) END
        |    AS pair_completeness
        |FROM c""".stripMargin,
    "q336_lsh_decontamination" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |                   for i in range(1, len(toks) - 1)]) AS sh
        |  FROM d WHERE len(toks) >= 3),
        |pairs AS (
        |  SELECT b.doc_id AS bench_id, t.doc_id AS train_id, t.source
        |  FROM s b, s t
        |  WHERE b.doc_id % 10 = 5 AND t.doc_id % 10 <> 5
        |    AND len(list_intersect(b.sh, t.sh))::DOUBLE /
        |        (len(b.sh) + len(t.sh) - len(list_intersect(b.sh, t.sh))) >= 0.5)
        |SELECT source, count(DISTINCT train_id)::BIGINT AS n_contaminated,
        |  count(*)::BIGINT AS n_pairs
        |FROM pairs GROUP BY source ORDER BY source""".stripMargin,
  )
}
