package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (BASELINE.json north star: dedup / text analysis at 100 TB design
  * point). Everything here is pure Catalyst column expressions —
  * codegen'd, no UDFs, no driver round-trips — so each scales as a
  * narrow map over however many partitions the documents table has.
  *
  * Hashing note: signatures are built on `xxhash64`, Spark's built-in
  * 64-bit hash expression. They are engine-internal (a DuckDB oracle
  * cannot reproduce them), so operators built on them are verified by
  * construction-based ScalaTests (planted near-duplicates) and
  * rows-only driver checks, per SURVEY §5.2.
  */
object TextFunctions {

  /** sequence(1, n) for n >= 1, else an EMPTY array — a bare
    * sequence(1, 0) yields the DESCENDING [1, 0], not [].
    */
  private def seq1to(count: Column): Column =
    when(count >= 1, sequence(lit(1), count))
      .otherwise(array().cast("array<int>"))

  /** Lower-cased whitespace tokens, empties dropped. Fused native
    * codegen expression (graft.expr.Tokens) — one scan, no regex
    * engine, no interpreted HOF filter; semantics identical to
    * [[tokensHof]] (differential-tested in TokensSpec).
    */
  def tokens(text: Column): Column =
    graft.expr.TokenizeExpression.tokens(text)

  /** The composable-expression form of [[tokens]] (kept as the
    * differential-test reference for the native codegen version).
    */
  def tokensHof(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Distinct word n-grams (shingles) of size n over the token array.
    * `transform(sequence(...))` keeps the whole thing in one codegen'd
    * expression: for token count T it emits max(T-n+1, 0) shingles.
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val count = greatest(size(toks) - lit(n - 1), lit(0))
    array_distinct(
      transform(seq1to(count), i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Distinct character k-grams of the lower-cased text. */
  def charShingles(text: Column, k: Int): Column = {
    val t = lower(text)
    val count = greatest(length(t) - lit(k - 1), lit(0))
    array_distinct(
      transform(seq1to(count), i => substring(t, i, lit(k))))
  }

  /** MinHash signature: H permutation-style hashes h_i(s) =
    * (a_i * xxhash64(s) + b_i) mod P, each minimized over the shingle
    * set (Broder '97 resemblance sketch). Returns array<bigint> of
    * length H; empty shingle set → all-P sentinel rows (never matches a
    * real signature).
    *
    * Cost: O(H · |shingles|) multiply-adds per row, all inside one
    * whole-stage-codegen'd projection — the standard trade for
    * shuffle-free near-dup candidate generation at scale.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.expr.MinHashExpression.minhash(shingles, numHashes)

  /** The composable-expression form of [[minhashSignature]] (kept as
    * the differential-test reference for the native codegen version;
    * interpreted HOF lambdas make it ~5× slower).
    *
    * 31-bit prime modulus: a*h+b stays < 2^63 for any numHashes < 2^20,
    * so the arithmetic is exact under ANSI mode (Spark 4 default — raw
    * 64-bit wraparound would throw ARITHMETIC_OVERFLOW).
    */
  def minhashSignatureHof(shingles: Column, numHashes: Int): Column = {
    val P = lit(2147483647L) // 2^31 - 1, Mersenne prime
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => {
        val a = i * lit(2L) + lit(1L) // odd multipliers
        val b = i * lit(982451653L) // large-prime stride
        coalesce(
          array_min(transform(shingles, s => pmod(pmod(xxhash64(s), P) * a + b, P))),
          P)
      })
  }

  /** LSH band keys for a minhash signature: split into `bands` bands of
    * `rowsPerBand` and hash each band slice (with its band index) to one
    * bucket key. Two docs sharing ANY band key are candidates.
    * numHashes must equal bands * rowsPerBand.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(
        concat_ws("_",
          b.cast("string"),
          concat_ws(",", transform(
            slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
            _.cast("string"))))))

  /** 64-bit SimHash (Charikar '02) over a token array: bit j of the
    * fingerprint is set iff the sum over tokens of ±1 (sign of bit j of
    * the token hash) is positive. One aggregate pass accumulates all 64
    * counters as an array; a second fold packs the sign bits.
    */
  def simhash64(toks: Column): Column =
    simhashGeneric(toks, bits = 64, tokHash = t => xxhash64(t))

  /** The ORACLE-EXACT SimHash dial (the q27/q194 hash-swap pattern):
    * per-token hash = the first 8 hex chars of md5 parsed as a 32-bit
    * integer — a value DuckDB derives with plain positional hex
    * arithmetic — so the whole counter/sign-bit pipeline is SQL-
    * reproducible. Same algebra as [[simhash64]]; only the gram hash
    * and width differ (xxhash64 stays the 64-bit production dial).
    */
  def simhashMd5_32(toks: Column): Column =
    simhashGeneric(toks, bits = 32,
      tokHash = t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  private def simhashGeneric(toks: Column, bits: Int,
      tokHash: Column => Column): Column = {
    // Hash once per token FIRST — folding over raw tokens would
    // re-evaluate the hash inside all per-bit counter updates.
    val tokHashes = transform(toks, tokHash)
    val counters = aggregate(
      tokHashes,
      array_repeat(lit(0L), bits),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(bits - 1)),
          (c, j) => c + call_function("shiftright", h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(bits - 1)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(a) + size(b) - size(array_intersect(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter / uni.cast("double"))
  }

  /** Winnowing-style document fingerprint (Schleimer/Wilkerson/Aiken
    * MOSS '03): hash all character k-grams (rolling-hash role played by
    * `gramHash` — xxhash64 by default: 8-byte sketches, the production
    * dial; pass `md5` for the oracle-exact judged form, q194's
    * precedent — the winnowing algebra is hash-agnostic since `least`
    * orders strings too), then keep the minimum hash of every sliding
    * window of `window` consecutive k-gram hashes. The distinct mins
    * are the fingerprint set — position-robust, locally sensitive to
    * edits.
    */
  def fingerprints(text: Column, k: Int, window: Int,
      gramHash: Column => Column = xxhash64(_)): Column = {
    require(window > 0 && (window & (window - 1)) == 0,
      "window must be a power of two (log-doubling sliding min)")
    val t = lower(text)
    val count = greatest(length(t) - lit(k - 1), lit(0))
    val hashes = transform(seq1to(count), i => gramHash(substring(t, i, lit(k))))
    // Sliding-window min by log-doubling: z_{s}[i] = min(h[i..i+2s-1]) =
    // least(z_{s/2}[i], z_{s/2}[i+s]). A naive per-window
    // `array_min(slice(hashes, i, w))` would re-evaluate the WHOLE hash
    // array inside every window's lambda (HOFs are interpreted, no
    // common-subexpression reuse) — O(L²·w) per row; this is O(L·log w)
    // with a small constant re-evaluation factor.
    var z = hashes
    var s = 1
    while (s < window) {
      z = zip_with(z, slice(z, lit(s + 1), size(z)), (a, b) => least(a, b))
      s *= 2
    }
    val windows = greatest(size(hashes) - lit(window - 1), lit(0))
    array_distinct(slice(z, lit(1), windows))
  }

  /** Tiny per-language stopword profiles for the heuristic classifier.
    * Deliberately small and ASCII-only so the same lists are usable in
    * the DuckDB oracle SQL verbatim.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "con", "una", "para", "por"))

  /** Stopword hits for one language profile over a token array. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** Heuristic language ID: argmax of stopword hits across profiles,
    * "und" (undetermined) when no profile matches at all. Ties break by
    * profile order (en first) — deterministic.
    */
  def languageId(toks: Column): Column = {
    val scored = stopwordProfiles.map { case (lang, words) =>
      (lang, stopwordHits(toks, words))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality signals (Gopher/C4-style heuristic filters): doc length,
    * mean word length, punctuation ratio, stopword ratio, and a composite
    * keep/drop score. All arithmetic over one token pass.
    */
  def qualityColumns(text: Column): Seq[Column] =
    qualityColumns(text, tokens(text))

  /** Overload taking a precomputed token column — pass an attribute
    * from a prior projection so the (interpreted) split+filter doesn't
    * re-run for each of the ~6 references below.
    */
  def qualityColumns(text: Column, toks: Column): Seq[Column] = {
    val nTok = size(toks)
    val nChar = length(text)
    val punct = nChar - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}]", ""))
    val stop = stopwordHits(toks, stopwordProfiles.head._2)
    val meanWordLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
      .otherwise(lit(0.0))
    Seq(
      nTok.as("n_tokens"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(punct.cast("double") / greatest(nChar, lit(1)), 4).as("punct_ratio"),
      round(stop.cast("double") / greatest(nTok, lit(1)), 4).as("stopword_ratio"),
      (nTok >= 5 && nTok <= 100000 &&
        meanWordLen >= 2 && meanWordLen <= 12).cast("int").as("quality_keep"))
  }

  /** Token counts: whitespace tokens and BPE-ish subword pieces (the
    * GPT-2 pre-tokenizer regex family: runs of letters, runs of digits,
    * single punctuation, collapsed whitespace). ~chars/4 is the usual
    * LLM estimate; this is the deterministic regex version.
    */
  def tokenCounts(text: Column): Seq[Column] = Seq(
    size(tokens(text)).as("ws_tokens"),
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("bpe_splits"),
    size(filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")).as("alnum_tokens"),
    (length(text).cast("long") / lit(4L)).cast("long").as("est_tokens"))
}
