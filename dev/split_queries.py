#!/usr/bin/env python3
"""Round-13 refactor: split the monolithic Queries.scala (16.5k lines)
into per-family trait files mixed back into `object Queries`, keeping
every def body, map entry, and oracle SQL byte-verbatim. The object's
public surface (Queries.all / Queries.oracle / Queries.qNN_*) is
unchanged; family traits are self-typed on Queries.type so helpers and
cross-family query calls resolve exactly as before.

Usage: python3 dev/split_queries.py   (run from /root/repo)
Writes src/main/scala/graft/queries/Queries{Family}.scala and rewrites
src/main/scala/graft/Queries.scala as the thin aggregator.
"""
import re, os, sys, collections

SRC = "src/main/scala/graft/Queries.scala"
OUTDIR = "src/main/scala/graft/queries"

lines = open(SRC).read().split("\n")

# ---- section boundaries ----
obj_start = next(i for i, l in enumerate(lines) if l.startswith("object Queries {"))
all_start = next(i for i, l in enumerate(lines) if l.startswith("  val all: Map[String,"))
oracle_start = next(i for i, l in enumerate(lines) if l.startswith("  val oracle: Map[String, String] = Map("))
assert lines[-1] == "" and lines[-2] == "}", lines[-3:]

header = lines[:obj_start]  # package + imports + object scaladoc

# ---- parse body members (obj_start+1 .. all_start-1) ----
member_re = re.compile(r"^  (?:private(?:\[\w+\])? |protected )?(?:lazy )?(?:def|val|var) (\w+)")
starts = []  # (line_idx, name)
for i in range(obj_start + 1, all_start):
    m = member_re.match(lines[i])
    if m:
        starts.append((i, m.group(1)))

def attach_comment(idx):
    """Walk back over the doc/line comments + blanks attached to a member."""
    j = idx - 1
    last_content = idx
    while j > obj_start:
        s = lines[j].strip()
        if s == "" :
            j -= 1; continue
        if s.startswith("*") or s.startswith("/**") or s.startswith("//"):
            last_content = j
            if s.startswith("/**"):  # top of a doc block: stop here
                j -= 1
                # allow further // or blank above? stop at doc top.
                break
            j -= 1; continue
        break
    return last_content

blocks = []  # (name, [lines])
for k, (i, name) in enumerate(starts):
    start = attach_comment(i)
    end = attach_comment(starts[k + 1][0]) if k + 1 < len(starts) else all_start
    # strip trailing blank lines from block; re-add one uniformly later
    blk = lines[start:end]
    while blk and blk[-1].strip() == "":
        blk.pop()
    blocks.append((name, blk))

# sanity: no lines lost between obj_start+1 and first block start
first_blk_start = attach_comment(starts[0][0])
for i in range(obj_start + 1, first_blk_start):
    assert lines[i].strip() == "", f"orphan line {i}: {lines[i]!r}"

# ---- parse `all` map ----
all_entries = {}   # name -> line
all_order = []
entry_re = re.compile(r'^    "(\w+)"\s*->')
i = all_start + 1
while i < oracle_start:
    l = lines[i]
    if l == "  )":
        break
    m = entry_re.match(l)
    assert m, f"unparsed all-map line {i}: {l!r}"
    all_entries[m.group(1)] = l
    all_order.append(m.group(1))
    i += 1

# ---- parse `oracle` map ----
oracle_entries = {}
oracle_order = []
cur, curname = None, None
for i in range(oracle_start + 1, len(lines) - 2):
    l = lines[i]
    if l == "  )":
        break
    m = entry_re.match(l)
    if m:
        if curname:
            oracle_entries[curname] = cur
        curname, cur = m.group(1), [l]
        oracle_order.append(curname)
    else:
        assert curname, f"oracle content before first entry at {i}"
        cur.append(l)
if curname:
    oracle_entries[curname] = cur

# ---- classification ----
def family(name):
    def has(*ks):
        return any(k in name for k in ks)
    if has("stream", "_tws", "mapstate", "liststate", "state_reader",
           "state_changefeed", "initial_state", "sessions_stateful",
           "session_window", "watermark"):
        return "Streaming"
    if has("sql_"):
        return "Sql"
    if has("media", "audio", "image", "video", "png", "wav", "avi",
           "mjpeg", "frame_sampling"):
        return "Media"
    if has("dsv2", "roundtrip", "ingest", "compaction", "zorder",
           "bucketed", "partitioned_prune", "partition_skew",
           "partition_planner", "catalog", "time_travel",
           "schema_evolution", "clickhouse", "source_mix", "csv",
           "columnar_scan", "merge_upsert", "snapshot_diff", "cdc_",
           "scd2", "dict_advisor", "codec_advisor", "sort_advisor",
           "join_order_advisor", "delta_bitwidth", "data_contract",
           "compress", "fanout_profile", "skew_diagnostics", "fk_audit",
           "inverted_index_disk", "bloom_join", "runtime_pruned",
           "runtime_bloom", "bitmap"):
        return "Io"
    if has("pagerank", "triangle", "kcore", "bfs", "label_prop",
           "components", "component_sizes", "sssp", "hits", "adamic",
           "assortativity", "rich_club", "modularity",
           "local_clustering", "ppr_", "cooccurrence", "posting"):
        return "Graph"
    if has("dedup", "minhash", "simhash", "fingerprint", "lsh",
           "containment", "setsim", "dup_spans", "winnowing",
           "edit_join", "jaro", "fuzzy", "blocking",
           "sorted_neighborhood", "entity_resolution", "golden_record",
           "contamination", "decontamination", "dup_rate",
           "chunk_overlap", "passage", "k_anonymity", "l_diversity"):
        return "Dedup"
    if has("cosine", "embed", "ann_", "ivf", "pq_", "ivfpq", "mmr",
           "knn", "centroid", "jl_projection", "pca", "semdedup",
           "semantic", "hard_negatives", "retrieval", "rrf",
           "linear_probe", "calibration", "auc", "isotonic",
           "scalar_quant", "variant", "feature_matrix",
           "target_encoding", "skyline", "probe_first"):
        return "Ml"
    if has("text", "token", "ngram", "bpe", "tfidf", "bm25", "stem",
           "lang", "vocab", "lexical", "zipf", "heaps", "perplexity",
           "gopher", "regex", "word", "phrase", "boilerplate",
           "collocation", "oov", "entropy", "repetition", "doc_freq",
           "lm_score", "bigram_lm", "novelty", "quality", "corpus",
           "scrub", "normalize", "length", "pack_chunks",
           "budget_select", "dsir", "temperature_mix", "epoch_mix",
           "class_balance", "split", "sax", "burstiness", "curation",
           "log_odds", "kl_divergence", "js_divergence",
           "mutual_information", "info_gain", "chi2_select",
           "gini_tokens", "rbo", "benford", "powerlaw", "markov",
           "transition", "doc_perplexity", "eval_holdout",
           "hash_fingerprint"):
        return "Text"
    if has("asof", "interval", "window", "session", "gapfill", "ohlc",
           "funnel", "retention", "seasonal", "acf", "trend",
           "attribution", "cohort", "gaps", "lateness", "concurrency",
           "path_analysis", "decayed", "ewma", "cusum", "changepoint",
           "period", "interp", "rolling", "timeout", "event_gaps",
           "nearest_event", "islands"):
        return "Time"
    if has("spearman", "kendall", "chisq", "anova", "mann_whitney",
           "bootstrap", "corr", "ks_test", "mcnemar", "diff_in_diff",
           "ab_test", "abtest", "srm", "psi", "tukey", "levene",
           "cronbach", "jarque", "grubbs", "mood", "kruskal",
           "cohens_d", "cohen_kappa", "effective_n", "fdr",
           "tost", "mann_kendall", "runs_test", "qq_", "whale",
           "kaplan", "covariate", "hhi", "weighted_median",
           "theil_sen", "multivariate_outliers", "anomaly", "mad_",
           "winsorize", "zscore", "quantile", "equidepth", "histogram",
           "deciles", "decile", "stats", "profile", "entropy",
           "simpson", "cramers", "chi", "outlier", "benford",
           "exp_histogram", "slope", "forecast", "regression"):
        return "Stats"
    return "Core"

fam_of = {}
for name, _ in blocks:
    m = re.match(r"q(\d+)(Sql)?(?:_|$)", name)
    if m:
        if m.group(2):  # q61Sql / q121Sql ride with their query
            target = next(n for n, _ in blocks
                          if re.match(rf"q{m.group(1)}_", n))
            fam_of[name] = family(target)
        else:
            fam_of[name] = family(name)
    else:
        fam_of[name] = "Shared"

counts = collections.Counter(fam_of.values())
print("family counts:", dict(counts))

FAMS = ["Core", "Io", "Sql", "Media", "Graph", "Dedup", "Ml", "Text",
        "Time", "Stats", "Streaming"]

FAM_DOC = {
    "Core": "relational core — TPC-H-style aggregation/join/window/set-op/shape queries (E1–E18 and kin)",
    "Io": "sources, sinks, storage layout and table-maintenance — DSv2 legs, round-trips, compaction/Z-order/bucketing, pruning, advisors, contracts",
    "Sql": "SQL-surface legs — subqueries, grouping sets, recursive/pipe/script/parameterized SQL, SQL UDFs",
    "Media": "multimodal columns — PCM/RGB byte DSP, PNG/WAV/AVI/MJPEG codecs, media curation pipeline",
    "Graph": "graph pillar — pagerank/components/k-core/BFS/SSSP/HITS/triangles and co-occurrence structure",
    "Dedup": "deduplication & record linkage — exact/minhash/simhash/LSH/containment/edit-distance families",
    "Ml": "embedding & model-adjacent ops — ANN (IVF/PQ), PCA, probes, rerankers, retrieval metrics, calibration",
    "Text": "text analysis & corpus curation — tokenizers, n-grams, quality, BPE, selection/mixing",
    "Time": "temporal analytics — as-of/interval joins, sessions, funnels, windows, time-series diagnostics",
    "Stats": "statistical tests & sketches — hypothesis tests, quantiles, outliers, distribution diagnostics",
    "Streaming": "Structured Streaming legs — stateful sessions/joins/dedup, state stores, drains",
}

IMPORTS = "\n".join(header[1:])  # everything after `package graft` up to object doc
# keep only import lines + blanks from header for the family files
import_lines = [l for l in header if l.startswith("import") or l == ""]
while import_lines and import_lines[-1] == "":
    import_lines.pop()
# The monolith also carried two OBJECT-level imports (original lines
# 438-439, swallowed into a member block by the parser); hoist them to
# file level in every family file so unqualified uses keep resolving.
import_lines += ["import graft.functions.TextFunctions",
                 "import graft.operators.Dedup"]

os.makedirs(OUTDIR, exist_ok=True)

emitted_all, emitted_oracle = set(), set()
for fam in FAMS + ["Shared"]:
    members = [(n, b) for n, b in blocks if fam_of[n] == fam]
    if not members:
        continue
    qnames_in_fam = [n for n, _ in members if re.match(r"q\d+_", n)]
    fam_all = [n for n in all_order if all_entries[n].split('"')[1] in
               # map key may differ from def name? keys == def names here
               qnames_in_fam] if fam != "Shared" else []
    fam_all = [n for n in all_order if n in qnames_in_fam]
    fam_oracle = [n for n in oracle_order if n in qnames_in_fam]
    emitted_all.update(fam_all)
    emitted_oracle.update(fam_oracle)

    out = []
    out.append("package graft")
    out.append("")
    out.extend(import_lines[1:] if import_lines and import_lines[0] == "" else import_lines)
    out.append("")
    if fam == "Shared":
        out.append("/** Shared helpers for the query families (split from the")
        out.append("  * monolithic Queries.scala in round 13, bodies verbatim):")
        out.append("  * table readers, staged-parquet memo, basket/shingle frames,")
        out.append("  * streaming scaffolding. Mixed into [[Queries]]; visibility is")
        out.append("  * private[graft] so family traits (self-typed on Queries.type)")
        out.append("  * and specs resolve them exactly as before the split. */")
        out.append("private[graft] trait QueriesShared { this: Queries.type =>")
    else:
        out.append(f"/** Query family: {FAM_DOC[fam]}.")
        out.append("  * Split from the monolithic Queries.scala (round 13) with def")
        out.append("  * bodies and oracle SQL byte-verbatim; surfaced unchanged via")
        out.append("  * [[Queries.all]] / [[Queries.oracle]]. */")
        out.append(f"private[graft] trait Queries{fam} {{ this: Queries.type =>")
    for n, b in members:
        out.append("")
        nb = list(b)
        if fam == "Shared":
            # widen trait-private helpers so sibling traits keep seeing them
            nb[0:1] = [re.sub(r"^  private (?!\[)", "  private[graft] ",
                              nb[0])] if nb else nb
            for j in range(len(nb)):
                if member_re.match(nb[j]):
                    nb[j] = re.sub(r"^  private (?!\[)", "  private[graft] ", nb[j])
        out.extend(nb)
    if fam != "Shared":
        out.append("")
        out.append(f"  private[graft] def {fam.lower()}All: Map[String, (SparkSession, String) => DataFrame] = Map(")
        for n in fam_all:
            out.append(all_entries[n])
        out.append("  )")
        out.append("")
        out.append(f"  private[graft] def {fam.lower()}Oracle: Map[String, String] = Map(")
        for n in fam_oracle:
            out.extend(oracle_entries[n])
        out.append("  )")
    out.append("}")
    out.append("")
    path = (f"{OUTDIR}/Queries{fam}.scala" if fam != "Shared"
            else f"{OUTDIR}/QueriesShared.scala")
    open(path, "w").write("\n".join(out))
    print(f"wrote {path}: {len(out)} lines, {len(members)} members, "
          f"{len(fam_all)} all-entries, {len(fam_oracle)} oracle-entries")

missing_all = [n for n in all_order if n not in emitted_all]
missing_oracle = [n for n in oracle_order if n not in emitted_oracle]
assert not missing_all, missing_all
assert not missing_oracle, missing_oracle

# ---- rewrite aggregator ----
agg = []
agg.extend(header)  # package, imports, original object scaladoc
agg.append("object Queries")
exts = "    extends QueriesShared\n" + "\n".join(
    f"    with Queries{f}" for f in FAMS if collections.Counter(fam_of.values())[f]) + " {"
agg.append(exts)
agg.append("")
agg.append("  /** Aggregated driver map — identical key set and closures to the")
agg.append("    * pre-split monolith (the split is per-family traits mixed into")
agg.append("    * this object; dev/split_queries.py verified entry parity). */")
agg.append("  val all: Map[String, (SparkSession, String) => DataFrame] =")
agg.append("    " + " ++ ".join(f"{f.lower()}All" for f in FAMS if counts[f]))
agg.append("")
agg.append("  val oracle: Map[String, String] =")
agg.append("    " + " ++ ".join(f"{f.lower()}Oracle" for f in FAMS if counts[f]))
agg.append("}")
agg.append("")
open(SRC, "w").write("\n".join(agg))
print(f"rewrote {SRC}: {len(agg)} lines")
print(f"all entries: {len(all_order)}  oracle entries: {len(oracle_order)}")
