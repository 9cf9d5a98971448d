package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.functions.TextFunctions._

/** Near-duplicate detection operators for LLM training-data curation
  * (BASELINE.json north star). Three families, all shuffle-frugal:
  *
  *  - MinHash + LSH banding: O(n) signature pass, shuffle keyed by
  *    8-byte band-bucket hashes (never by document bodies), candidate
  *    pairs only within buckets, exact-Jaccard re-rank. The standard
  *    100 TB-scale text dedup (Broder resemblance + banding).
  *  - SimHash: one 64-bit fingerprint per doc; near-dups = small
  *    Hamming distance, candidates via fingerprint prefix buckets.
  *  - Embedding cosine: exact threshold join (quadratic, for
  *    verification) and an LSH (random-hyperplane) bucketed variant
  *    (the scale path).
  *
  * All candidate-pair joins key on `id_a < id_b` so each pair appears
  * exactly once.
  */
object Dedup {

  /** Exact dedup keyed by a 128-bit content hash (xxhash64 of the text
    * plus xxhash64 of (text, const) — two decorrelated 64-bit
    * functions): keeps the min-id doc per distinct `textCol`,
    * counts the duplicates it absorbs. The shuffle carries ONLY
    * (h1, h2, id) — 24 bytes/row, never the document body — which is
    * what makes this viable at 100 TB. 128 bits ⇒ collision
    * probability ~n²/2¹²⁹ (≪ 10⁻¹⁸ even at a trillion docs). Grouping
    * by the text itself (see q06's oracle form) is the exact-equality
    * alternative when bodies are small enough to shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      xxhash64(col(textCol)).as("__h1"),
      xxhash64(col(textCol), lit(7)).as("__h2"))
      .groupBy(col("__h1"), col("__h2"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** MinHash-LSH candidate pairs with exact-Jaccard re-rank.
    *
    * @param numHashes signature length (bands * rowsPerBand)
    * @param bands     LSH bands; P(candidate | jaccard=s) =
    *                  1 - (1 - s^rowsPerBand)^bands
    * @param threshold keep pairs with exact shingle-Jaccard >= threshold
    * @return (id_a, id_b, jaccard) one row per near-dup pair
    *
    * CALLER RELEASES THE CACHE: the hashed-shingle corpus is lazily
    * persisted inside (it feeds the signature build plus both re-rank
    * joins). After materializing the result, drop it with
    * `spark.catalog.clearCache()` or
    * `df.sparkSession.sharedState.cacheManager.clearCache()` — long
    * sessions (notebooks, services) that call this repeatedly without
    * releasing accumulate cached corpora in the block manager.
    * Bench/Verify do this between queries.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands

    // Fused index build: text → sorted distinct shingle HASHES in one
    // codegen expression (graft.expr.ShingleHashes), then the signature
    // from the hashes directly — MinHashSignature's own first step is
    // xxhash64 of each shingle string, so MinHashFromHashes computes
    // the identical signature without ever materializing the string
    // array (the interpreted HOF tower it replaces dominated q23's
    // profile). Empty hash set ⟺ fewer than shingleSize tokens.
    // Persisted because it is consumed THREE times (signature build +
    // both re-rank joins) — without the cache each consumer re-scans
    // the source and re-tokenizes the full corpus (the r3 q53 bench
    // regression). Lazy persist (not an eager checkpoint) so callers
    // that only inspect plans never run a job; MEMORY_AND_DISK spills
    // rather than OOMs at scale. Registered with CacheRegistry so ANY
    // caller can release it after its terminal action
    // (CacheRegistry.releaseAll() — Bench/Verify call it per query).
    val hashed = df
      .select(col(idCol).as("id"),
        graft.expr.ShingleExpression.shingleHashes(col(textCol), shingleSize).as("hs"))
      // Cache BELOW the non-empty filter (r13): with the filter inside
      // the cached subtree, pushdown inlined shingle_hashes into the
      // filter condition and the cache build evaluated the shingle
      // expression twice per row; filtering ABOVE the cache reads the
      // materialized array's size instead. Same rows downstream.
      .persistTracked()
      .filter(size(col("hs")) >= 1)
    val sigs = hashed
      .withColumn("sig", graft.expr.MinHashExpression.minhashHashed(col("hs"), numHashes))
      .withColumn("band_key", explode(lshBandKeys(col("sig"), bands, rowsPerBand)))

    // Candidates-first: the band self-join carries ONLY (band_key, id)
    // — 16 bytes/row — never the shingle arrays, and each candidate
    // pair is deduped BEFORE the exact-Jaccard re-rank, so Jaccard runs
    // exactly once per pair (a pair colliding in k bands would
    // otherwise re-rank k times). The shingle arrays are then attached
    // by two id-keyed joins of the (small) candidate set back to the
    // doc shingles. At 100 TB this is the difference between shuffling
    // O(n · bands · |shingles|) bytes and O(n · bands · 16) bytes.
    // PERSISTED (r13 optimization): both self-join sides consume this
    // frame, and without the cache each side re-runs the 32-hash
    // MinHash signature over every doc's shingle set (the dominant
    // map CPU) — the cache is 16 B/row · bands, orders smaller than
    // the shingle frame it derives from, so at any scale caching the
    // banded ids is strictly cheaper than recomputing signatures.
    val bandedIds = sigs.select(col("band_key"), col("id")).persistTracked()
    val cand = bandedIds.select(col("band_key"), col("id").as("id_a"))
      .join(bandedIds.select(col("band_key"), col("id").as("id_b")), Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // Exact re-rank over the hashed sets: Jaccard of distinct-hash
    // arrays equals Jaccard of the shingle strings absent a 64-bit
    // collision (~|vocab|²/2⁶⁵ — the same accepted trade as q49/q106,
    // and one the string-exact oracle would expose immediately).
    cand
      .join(hashed.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash-LSH near-dup pairs with a BOUNDED per-band bucket — the
    * adversarial-duplication guard (round 13). [[minhashLshPairs]]'s
    * band self-join emits all C(n,2) pairs of every bucket; on benign
    * corpora buckets are O(1), but a corpus where a large fraction of
    * docs sit in a few giant near-dup clusters (scraped mirror sites,
    * boilerplate floods) puts the WHOLE cluster in one bucket per
    * band, and candidate pairs go quadratic in cluster size — the
    * classic LSH failure mode at 100 TB. Guard: buckets with more than
    * `maxBucket` members switch from all-pairs to a STAR — every
    * member pairs with the bucket's min-id hub only — so per-bucket
    * emission drops from O(n²) to O(n) while CONNECTIVITY within the
    * bucket is fully preserved (all members reach each other through
    * the hub), which is the property the downstream
    * connected-components dedup (q158's pipeline) actually consumes.
    *
    * Semantics vs the unbounded form:
    *  - component structure over TRUE near-dup clusters is unchanged
    *    (an exact/near-dup cluster's bucket hub IS a near-dup of every
    *    member, so hub edges survive the Jaccard verify);
    *  - pair-level recall for pairs that collide ONLY in overflowed
    *    buckets is reduced to hub pairs (documented trade — the FAISS
    *    -style bucket cap). On exact-duplicate clusters the output is
    *    exactly {(min_id, other) | other ∈ cluster}, which is what the
    *    q370 oracle pins in SQL.
    *
    * Cost shape: one extra groupBy on the 8-byte band key (bucket
    * size + hub) joined back on the same key — both stages carry
    * 16-24 B rows, never shingles; the giant-bucket join is an
    * equi-join AQE can skew-split, never a single-task window buffer.
    * Caller releases the cache ([[minhashLshPairs]] contract).
    */
  def minhashLshPairsBounded(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(maxBucket >= 2, "maxBucket must allow at least one pair")
    val rowsPerBand = numHashes / bands
    val hashed = df
      .select(col(idCol).as("id"),
        graft.expr.ShingleExpression.shingleHashes(col(textCol), shingleSize).as("hs"))
      // Cache BELOW the non-empty filter (r13): with the filter inside
      // the cached subtree, pushdown inlined shingle_hashes into the
      // filter condition and the cache build evaluated the shingle
      // expression twice per row; filtering ABOVE the cache reads the
      // materialized array's size instead. Same rows downstream.
      .persistTracked()
      .filter(size(col("hs")) >= 1)
    // PERSISTED (r13 optimization): consumed FOUR times (bucket stats,
    // the stats tag-back join, and both sides of the small-bucket
    // self-join) — without the cache each consumer re-runs the 32-hash
    // MinHash signature over the cached shingle sets. 16 B/row · bands.
    val bandedIds = hashed
      .withColumn("sig", graft.expr.MinHashExpression.minhashHashed(col("hs"), numHashes))
      .select(col("id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band_key"))
      .persistTracked()
    val stats = bandedIds.groupBy("band_key")
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__hub"))
    val tagged = bandedIds.join(stats, Seq("band_key"))
    val small = tagged.filter(col("__n") <= maxBucket)
      .select(col("band_key"), col("id"))
    val smallPairs = small.select(col("band_key"), col("id").as("id_a"))
      .join(small.select(col("band_key"), col("id").as("id_b")), Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val starPairs = tagged
      .filter(col("__n") > maxBucket && col("id") =!= col("__hub"))
      .select(col("__hub").as("id_a"), col("id").as("id_b"))
    val cand = smallPairs.unionByName(starPairs)
      .dropDuplicates("id_a", "id_b")
    cand
      .join(hashed.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-band bucket-size accounting for the LSH stress/telemetry
    * ledger: one row per (bucket-size) with the bucket count and the
    * candidate pairs an UNBOUNDED all-pairs band join would emit from
    * buckets of that size (Σ C(n,2) before cross-band dedup) next to
    * what the `maxBucket`-bounded form emits (C(n,2) capped / star
    * n−1). This is the "measure, don't guess" frame the round-13
    * adversarial rehearsal records — quadratic blowup shows up here
    * as the unbounded column exploding while the bounded one stays
    * linear in cluster size.
    */
  def lshBucketStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    df.select(col(idCol).as("id"),
        graft.expr.ShingleExpression.shingleHashes(col(textCol), shingleSize).as("hs"))
      .filter(size(col("hs")) >= 1)
      .withColumn("sig", graft.expr.MinHashExpression.minhashHashed(col("hs"), numHashes))
      .select(explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band_key"))
      .groupBy("band_key").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n") * (col("n") - 1) / 2).as("unbounded_pairs"),
        sum(when(col("n") <= maxBucket, col("n") * (col("n") - 1) / 2)
          .otherwise(col("n") - 1)).as("bounded_pairs"))
      .orderBy(col("n"))
  }

  /** Cross-corpus MinHash-LSH pairs: LEFT (e.g. a benchmark/eval set)
    * against RIGHT (the training corpus) — the decontamination join
    * (Dolma/RefinedWeb-style): which right-side docs near-duplicate
    * ANY left-side doc. Identical banding/candidates-first discipline
    * to [[minhashLshPairs]], but the band join is ASYMMETRIC — left
    * bands join right bands only, so candidate count scales with
    * |left|·collisions, never |right|² (the self-join would spend
    * almost all its work on right×right pairs this caller discards).
    * Both sides' hashed-shingle frames persist for the re-rank joins;
    * CALLER RELEASES THE CACHE (the [[minhashLshPairs]] contract).
    *
    * @return (id_l, id_r, jaccard) — one row per cross pair at or
    *         above the threshold
    */
  def minhashLshPairsCross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    def prep(df: DataFrame): (DataFrame, DataFrame) = {
      val hashed = df
        .select(col(idCol).as("id"),
          graft.expr.ShingleExpression.shingleHashes(col(textCol), shingleSize).as("hs"))
        // Cache below the filter — same single-evaluation rationale as
        // minhashLshPairs (r13).
        .persistTracked()
        .filter(size(col("hs")) >= 1)
      // Persisted like minhashLshPairs' bandedIds: the asymmetric band
      // join consumes each side once, but candidates re-derive from the
      // banded frame only through the cache (16 B/row · bands), never a
      // second signature pass.
      val banded = hashed
        .withColumn("sig", graft.expr.MinHashExpression.minhashHashed(col("hs"), numHashes))
        .select(col("id"),
          explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band_key"))
        .persistTracked()
      (hashed, banded)
    }
    val (hashedL, bandedL) = prep(left)
    val (hashedR, bandedR) = prep(right)
    val cand = bandedL.select(col("band_key"), col("id").as("id_l"))
      .join(bandedR.select(col("band_key"), col("id").as("id_r")), Seq("band_key"))
      .select("id_l", "id_r")
      .dropDuplicates("id_l", "id_r")
    cand
      .join(hashedL.select(col("id").as("id_l"), col("hs").as("sh_l")), Seq("id_l"))
      .join(hashedR.select(col("id").as("id_r"), col("hs").as("sh_r")), Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        round(jaccard(col("sh_l"), col("sh_r")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit
    * fingerprint quadrants (any pair within Hamming distance <= 3 must
    * agree on at least one quadrant — pigeonhole), verified by exact
    * Hamming distance.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fps = df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("fp"))
      .withColumn("quadrant", explode(
        transform(sequence(lit(0), lit(3)),
          q => concat_ws(":", q.cast("string"),
            call_function("shiftright", col("fp"), q * lit(16)).bitwiseAND(lit(0xFFFFL)).cast("string")))))
    val a = fps.select(col("quadrant"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = fps.select(col("quadrant"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("quadrant"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Native codegen'd dot product (graft.expr.DotProduct) — the
    * interpreted `aggregate(zip_with(...))` form dominated the bench
    * on quadratic pair joins.
    */
  private def dot(a: Column, b: Column): Column =
    graft.expr.VectorExpressions.dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact embedding near-dup pairs: all pairs with cosine >= threshold.
    * Quadratic — the verification baseline. Pre-normalizes each vector
    * once (O(n·d)) so the pair stage is a single dot product.
    */
  /** Pre-normalized vectors: the norm is computed in its OWN projection
    * step so CollapseProject won't inline the O(d) dot product into
    * every element's division (which would make normalization O(d²)).
    */
  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .select(col("id"), col("v"), sqrt(dot(col("v"), col("v"))).as("norm"))
      .select(col("id"), transform(col("v"), x => x / col("norm")).as("nv"))

  def embeddingPairsExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val normed = normalized(df, idCol, vecCol)
    val a = normed.select(col("id").as("id_a"), col("nv").as("nv_a"))
    val b = normed.select(col("id").as("id_b"), col("nv").as("nv_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot(col("nv_a"), col("nv_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact all-pairs cosine via TRIANGLE BLOCKING: same O(n²) compute
    * as [[embeddingPairsExact]] (exact all-pairs is inherently
    * quadratic — LSH/IVF are the sub-quadratic scale paths), but
    * restructured from one `CartesianProduct` into an EQUI-join over
    * upper-triangle block cells, which is how the job actually
    * survives a cluster:
    *
    *  - each row lands in block `pmod(hash(id), B)`; the left
    *    replica fans out to cells (blk, blk..B-1), the right replica
    *    to cells (0..blk, blk), so every unordered pair of blocks
    *    meets in exactly ONE cell (p ≤ q) — the replication factor is
    *    (B+1)/2 per side, half the naive B×B grid;
    *  - the cell key (bi, bj) is an equi-join key, so the pair stage
    *    is a ShuffledHashJoin/SortMergeJoin with B(B+1)/2 bounded
    *    cells (~ (2n/B)² pairs each) instead of a single nested-loop
    *    whose per-task size Spark can neither bound nor AQE-replan;
    *  - cross-block cells (p < q) produce each pair once in arbitrary
    *    id order; diagonal cells (p = q) produce both orders — the
    *    `bi < bj || id_a < id_b` filter plus least/greatest
    *    normalization keep exactly one row per pair either way.
    *
    * B should scale with n so a cell's pair count stays ~constant
    * (B ∝ n / rows-per-task); 16 cells/side at bench scale.
    */
  def embeddingPairsExactBlocked(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blocks: Int = 16): DataFrame = {
    val withBlk = normalized(df, idCol, vecCol)
      .select(col("id"), col("nv"), pmod(xxhash64(col("id")), lit(blocks)).as("blk"))
    val left = withBlk.select(
      col("blk").as("bi"), explode(sequence(col("blk"), lit(blocks - 1))).as("bj"),
      col("id").as("id_a"), col("nv").as("nv_a"))
    val right = withBlk.select(
      explode(sequence(lit(0), col("blk"))).as("bi"), col("blk").as("bj"),
      col("id").as("id_b"), col("nv").as("nv_b"))
    left.join(right, Seq("bi", "bj"))
      .filter(col("bi") < col("bj") || col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot(col("nv_a"), col("nv_b")), 4))
      .filter(col("cosine") >= threshold)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("cosine"))
  }

  /** Random-hyperplane LSH buckets for embeddings (Charikar): sign bits
    * of `numPlanes` fixed pseudo-random hyperplanes, packed into one
    * long bucket id. Pr[same bit] = 1 - angle/π. Deterministic planes
    * derived from xxhash64(plane, dim) — no RNG state to ship.
    */
  def embeddingLshBucket(vecCol: Column, dim: Int, numPlanes: Int,
      planeSeed: Int = 0): Column = {
    val planes: Seq[Column] = (0 until numPlanes).map { p =>
      // plane vector component j = signed hash in [-1, 1]
      val proj = aggregate(
        zip_with(asDouble(vecCol), sequence(lit(0), lit(dim - 1)),
          (x, j) => x * (pmod(xxhash64(lit((planeSeed + p).toLong), j), lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed embedding near-dup: exact cosine only within buckets.
    * The scale path — shuffle keys are single longs; recall is tunable
    * via numPlanes (fewer planes → bigger buckets → higher recall).
    */
  def embeddingPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 8): DataFrame = {
    val bucketed = normalized(df, idCol, vecCol)
      .select(col("id"), col("nv"),
        embeddingLshBucket(col("nv"), dim, numPlanes).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("nv").as("nv_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("nv").as("nv_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot(col("nv_a"), col("nv_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** tables×numPlanes hyperplanes, each component uniform in [-1, 1]:
    * a deterministic pure function of (plane, dim-index) through the
    * shared splitmix64 finalizer ([[graft.expr.Splitmix]]) — no RNG
    * state to ship, the matrix rebuilds identically on every driver
    * (the [[embeddingLshBucket]] xxhash64 trick, computed driver-side
    * once instead of per row).
    */
  private def planeMatrix(dim: Int, numPlanes: Int, tables: Int): Array[Array[Double]] =
    Array.tabulate(tables * numPlanes) { p =>
      Array.tabulate(dim) { j =>
        val m = java.lang.Math.floorMod(
          graft.expr.Splitmix.mix64(p * 1000003L + j), 2000001L)
        m.toDouble / 1000000.0 - 1.0
      }
    }

  /** BANDED multi-table hyperplane LSH near-dup pairs — the
    * recall-amplified form of [[embeddingPairsLsh]] (the OR-of-ANDs
    * construction [[minhashLshPairs]] uses for MinHash, applied to
    * Charikar sign-bit buckets): `tables` independent plane sets, a
    * pair is a candidate if it collides in ANY table, so recall for a
    * pair at angle θ is 1 − (1 − (1 − θ/π)^numPlanes)^tables — near-dup
    * pairs (cosine ≳ 0.98, per-table collision ~0.64 at 8 planes)
    * survive with miss probability ~1e-11 at 24 tables while
    * background near-orthogonal pairs stay spread across 2^numPlanes
    * buckets per table. Candidates-first discipline: the per-table
    * bucket self-join carries ONLY (bucket, id) — 16 bytes/row, never
    * the vectors — and pairs are deduped across tables BEFORE the
    * exact-cosine re-rank, so each candidate pair ranks exactly once.
    * The normalized frame persists for the two id-keyed re-rank
    * joins; caller releases the cache ([[minhashLshPairs]] contract).
    */
  def embeddingPairsLshBanded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 8,
      tables: Int = 24): DataFrame = {
    require(numPlanes < 56, "table index must fit above the plane bits")
    val normed = normalized(df, idCol, vecCol).persistTracked()
    val keys = graft.expr.VectorExpressions.lshBucketKeys(
      col("nv"), planeMatrix(dim, numPlanes, tables), numPlanes, tables)
    // Persisted (r13): both self-join sides consume this frame; the
    // cache (16 B/row · tables) replaces a second numPlanes·tables
    // hyperplane-projection pass over every vector.
    val banded = normed.select(col("id"), explode(keys).as("bucket"))
      .persistTracked()
    val cand = banded.select(col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .join(normed.select(col("id").as("id_a"), col("nv").as("nv_a")), Seq("id_a"))
      .join(normed.select(col("id").as("id_b"), col("nv").as("nv_b")), Seq("id_b"))
      .withColumn("cosine", round(dot(col("nv_a"), col("nv_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** [[embeddingPairsLshBanded]] with the BOUNDED per-bucket guard
    * (the round-13 adversarial-duplication rule, mirroring
    * [[minhashLshPairsBounded]]): a hyperplane bucket with more than
    * `maxBucket` members — which at 100 TB means an embedding-level
    * duplicate flood, e.g. the same boilerplate page embedded millions
    * of times — emits a STAR to its min-id hub instead of all pairs,
    * so per-bucket emission is O(n) while connectivity (what SemDeDup
    * -style cluster dedup consumes downstream) is preserved. Same
    * candidates-first discipline; same recall trade as the text form
    * (pairs colliding ONLY in overflowed buckets reduce to hub
    * pairs). Caller releases the cache.
    */
  def embeddingPairsLshBandedBounded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 8,
      tables: Int = 24,
      maxBucket: Int = 64): DataFrame = {
    require(numPlanes < 56, "table index must fit above the plane bits")
    require(maxBucket >= 2, "maxBucket must allow at least one pair")
    val normed = normalized(df, idCol, vecCol).persistTracked()
    val keys = graft.expr.VectorExpressions.lshBucketKeys(
      col("nv"), planeMatrix(dim, numPlanes, tables), numPlanes, tables)
    // Persisted (r13): consumed four times (stats, tag-back, both
    // self-join sides) — same rationale as minhashLshPairsBounded.
    val banded = normed.select(col("id"), explode(keys).as("bucket"))
      .persistTracked()
    val stats = banded.groupBy("bucket")
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__hub"))
    val tagged = banded.join(stats, Seq("bucket"))
    val small = tagged.filter(col("__n") <= maxBucket)
      .select(col("bucket"), col("id"))
    val smallPairs = small.select(col("bucket"), col("id").as("id_a"))
      .join(small.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val starPairs = tagged
      .filter(col("__n") > maxBucket && col("id") =!= col("__hub"))
      .select(col("__hub").as("id_a"), col("id").as("id_b"))
    val cand = smallPairs.unionByName(starPairs)
      .dropDuplicates("id_a", "id_b")
    cand
      .join(normed.select(col("id").as("id_a"), col("nv").as("nv_a")), Seq("id_a"))
      .join(normed.select(col("id").as("id_b"), col("nv").as("nv_b")), Seq("id_b"))
      .withColumn("cosine", round(dot(col("nv_a"), col("nv_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Brute-force cosine top-k neighbors of one probe vector (the exact
    * ANN baseline; plans as broadcast of the probe + TakeOrdered).
    */
  def cosineTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      probe: DataFrame,
      k: Int): DataFrame = {
    val base = normalized(df, idCol, vecCol)
    val q = normalized(probe.select(lit(0L).as("pid"), col(vecCol)), "pid", vecCol)
      .select(col("nv").as("qnv"))
    base.crossJoin(broadcast(q))
      .select(col("id"), round(dot(col("nv"), col("qnv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }
}
