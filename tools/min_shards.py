#!/usr/bin/env python3
"""Min-combine several legs of the SAME BenchWide shard into one shard
file (per-query min on queries and both probe blocks, total recomputed
from the min'd queries, failed = union).

Why: single-sample cold times on this box swing up to 5x minutes apart
(r14: q251 3.8 -> 20.5 s, q24 113 -> 400 s between two shard-interleaved
sweeps), so no single-leg sweep pair survives the spread-repeatability
qualification. Min-of-legs is the repo's standing arbiter for
one-sided timing noise (SCALE.md hand A/B protocol); applying it per
shard turns the sweep into the same kind of instrument. The output is
shaped exactly like a graft.BenchWide shard file, so
tools/merge_benchwide.py consumes it unchanged.

Usage: python3 tools/min_shards.py OUT.json legA.json legB.json [...]
"""
import json
import sys


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_path, leg_paths = sys.argv[1], sys.argv[2:]
    legs = []
    for p in leg_paths:
        with open(p) as f:
            legs.append(json.load(f))

    base = legs[0]
    for leg in legs[1:]:
        for k in ("shard", "n_shards", "sf"):
            if leg.get(k) != base.get(k):
                sys.exit(f"min_shards: leg mismatch on {k}: "
                         f"{leg.get(k)} != {base.get(k)}")
        if set(leg["queries"]) != set(base["queries"]):
            sys.exit("min_shards: legs measured different query sets")

    def min_block(key):
        names = set(base.get(key, {}))
        for leg in legs[1:]:
            names &= set(leg.get(key, {}))
        return {q: min(leg[key][q] for leg in legs) for q in sorted(names)}

    queries = min_block("queries")
    merged = {
        "metric": base.get("metric"),
        "value": round(sum(queries.values()), 3),
        "unit": base.get("unit"),
        "sf": base.get("sf"),
        "shard": base.get("shard"),
        "n_shards": base.get("n_shards"),
        "n_legs": len(legs),
        "failed": sorted({q for leg in legs for q in leg.get("failed", [])}),
        "probe_before": min_block("probe_before"),
        "probe_after": min_block("probe_after"),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"min_shards: shard {base.get('shard')} min of {len(legs)} legs "
          f"-> {merged['value']}s")


if __name__ == "__main__":
    main()
