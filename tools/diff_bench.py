#!/usr/bin/env python3
"""Diff two headline BENCH.json snapshots with de-drifting.

The round-9/round-10 lesson: the box drifts uniformly ±20-75% between
sessions, so raw round-over-round ratios flag phantom regressions (the
four r9 flags were ALL noise under interleaved A/B — see README
"Regression adjudications"). This differ removes the uniform component
first: every per-query ratio is divided by the MEDIAN ratio across the
shared query set (touched and untouched alike), and only the de-drifted
residual is tested against the per-query noise bar

    |dedrifted - 1| > max(2 * cv_q, MIN_REL)

where cv_q = max(old_cv, new_cv) for the query (the 5-warm-run CV both
files carry). Flags are a WORKLIST for the interleaved fresh-JVM A/B
protocol (tools/ab_headline.sh), not a verdict.

Usage:
  python3 tools/diff_bench.py OLD.json NEW.json [--min-rel 0.15] [--out OUT.json]
Typical: python3 tools/diff_bench.py <(git show HEAD:BENCH.json) BENCH.json
"""
import argparse
import json
import statistics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-rel", type=float, default=0.15)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    old = json.load(open(a.old))
    new = json.load(open(a.new))
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = {q: new["queries"][q] / old["queries"][q] for q in shared}
    drift = statistics.median(ratios.values())
    flagged = []
    for q in shared:
        dd = ratios[q] / drift
        cv = max(old.get("cv", {}).get(q, 0.0), new.get("cv", {}).get(q, 0.0))
        bar = max(2 * cv, a.min_rel)
        if abs(dd - 1) > bar:
            flagged.append({
                "query": q, "old_sec": round(old["queries"][q], 3),
                "new_sec": round(new["queries"][q], 3),
                "ratio": round(ratios[q], 3), "dedrifted": round(dd, 3),
                "bar": round(bar, 3), "cv": round(cv, 3)})
    flagged.sort(key=lambda f: -abs(f["dedrifted"] - 1))
    rep = {
        "old_total_sec": round(sum(old["queries"][q] for q in shared), 2),
        "new_total_sec": round(sum(new["queries"][q] for q in shared), 2),
        "n_shared": len(shared),
        "median_drift_ratio": round(drift, 3),
        "min_rel": a.min_rel,
        "flagged": flagged,
        "note": "de-drifted flags are a worklist for tools/ab_headline.sh "
                "(interleaved fresh-JVM A/B), not a verdict",
    }
    print(json.dumps(rep, indent=1))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
