#!/usr/bin/env python3
# Diff two Bench JSON artifacts (BENCH_r{N}.json or a raw Bench stdout
# line): aligns the ASCII-sorted qNN centisecond arrays and prints the
# biggest regressions/improvements plus the c10/cold-adjusted deltas.
# Usage: python3 dev/bench_diff.py BENCH_r08.json BENCH_r09.json [topN]
import json, sys


def load(path):
    raw = json.load(open(path))
    # driver artifacts wrap the bench line under 'tail'; raw lines are
    # the dict itself
    if "qv" not in raw and "tail" in raw:
        for line in raw["tail"].splitlines():
            line = line.strip()
            if line.startswith("{") and '"qv"' in line:
                raw = json.loads(line)
                break
    if "qv" not in raw or "parsed" in raw and isinstance(raw.get("parsed"), dict) and "qv" in raw["parsed"]:
        raw = raw.get("parsed", raw)
    assert "qv" in raw, f"{path}: no qv array found"
    return raw


def qmap(b):
    # qv is aligned with the ASCII-sorted qNN prefixes; reconstruct the
    # names from nq by sorting the known key space is impossible without
    # the keys, so we diff positionally ONLY when both runs carry the
    # same nq; otherwise we diff the c10 dicts (named) and totals.
    return b


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    print(f"total: {a['value']} -> {b['value']} "
          f"({b['value'] - a['value']:+.2f} s; nq {a['nq']} -> {b['nq']})")
    if "total_cold_adj" in a and "total_cold_adj" in b:
        print(f"cold_adj: {a['total_cold_adj']} -> {b['total_cold_adj']}")
    ca, cb = a.get("c10", {}), b.get("c10", {})
    if ca or cb:
        names = sorted(set(ca) | set(cb))
        print("c10 (cs):")
        for n in names:
            va, vb = ca.get(n), cb.get(n)
            d = "" if va is None or vb is None else f" ({vb - va:+d})"
            print(f"  {n}: {va} -> {vb}{d}")
    if a["nq"] == b["nq"]:
        qa, qb = a["qv"], b["qv"]
        deltas = sorted(((qb[i] - qa[i], i) for i in range(len(qa))))
        print(f"positional qv deltas (cs; same nq={a['nq']}, ASCII order):")
        print("  biggest regressions:",
              [(i, f"+{d}") for d, i in deltas[-top:][::-1] if d > 0])
        print("  biggest improvements:",
              [(i, d) for d, i in deltas[:top] if d < 0])
    else:
        print("(different query counts — positional qv diff skipped)")


if __name__ == "__main__":
    main()
