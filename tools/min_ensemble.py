#!/usr/bin/env python3
"""Per-query MIN-ensemble over a set of bench runs (verdict r11 item 1).

Co-tenant load on this host is one-sided noise: it can only INFLATE a
query's wall time, never deflate it (the engine does no cross-run
caching beyond what every run shares). The minimum over runs is
therefore a statistically defensible estimate of each query's quiet
cost, and the sum of minima is a lower-bound anchor for the quiet-band
full-suite total when no single run lands in a quiet window.

Input: bench output files (one or more), each containing the
`{"metric":"full_query_map","queries":{...}}` line graft.Bench prints
before its summary (the loop at /tmp/bench_loop.sh archives one file
per attempt). Failed-query sentinels (-1) are excluded per query, not
per run.

Usage: min_ensemble.py <run_file>... [--json]
"""
import json
import sys


def load_map(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("metric") == "full_query_map":
                return d["queries"]
    return None


def main(argv):
    as_json = "--json" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if not paths:
        print(__doc__, file=sys.stderr)
        return 2
    runs = []
    for p in paths:
        m = load_map(p)
        if m is None:
            print(f"[min-ensemble] no full_query_map in {p} — skipped",
                  file=sys.stderr)
            continue
        runs.append((p, m))
    if not runs:
        print("[min-ensemble] no usable runs", file=sys.stderr)
        return 1
    keys = sorted({k for _, m in runs for k in m})
    ens, missing = {}, []
    for k in keys:
        vals = [m[k] for _, m in runs if k in m and m[k] >= 0]
        if vals:
            ens[k] = min(vals)
        else:
            missing.append(k)
    total = sum(ens.values())
    out = {
        "metric": "min_ensemble_total",
        "value": round(total, 2),
        "unit": "sec",
        "n_queries": len(ens),
        "n_runs": len(runs),
        "missing": missing,
        "runs": [p for p, _ in runs],
    }
    if as_json:
        out["queries"] = {k: round(v, 2) for k, v in ens.items()}
    print(json.dumps(out))
    # top contributors for the BASELINE.md note
    top = sorted(ens.items(), key=lambda kv: -kv[1])[:10]
    print("top10: " + ", ".join(f"{k} {v:.2f}" for k, v in top),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
