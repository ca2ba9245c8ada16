#!/usr/bin/env python3
"""Compute per-query scaling slopes between two Bench runs.

Usage: scale_slopes.py <bench_small.json> <bench_big.json> <data_ratio> [out.json]

Emits one JSON object: per-query warm times at both scales, the
time ratio, and the slope class (sub-linear / ~linear / super-linear
relative to <data_ratio>). A query is flagged when its time ratio
exceeds 1.2x the data ratio.
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
data_ratio = float(sys.argv[3])
out_path = sys.argv[4] if len(sys.argv) > 4 else None

qs = {}
flagged = []
for name, t_small in sorted(small["queries"].items()):
    t_big = big["queries"].get(name)
    if t_big is None:
        continue
    ratio = t_big / t_small if t_small > 0 else float("inf")
    cls = ("sub-linear" if ratio < 0.8 * data_ratio
           else "linear" if ratio <= 1.2 * data_ratio
           else "super-linear")
    qs[name] = {"warm_small_sec": round(t_small, 3),
                "warm_big_sec": round(t_big, 3),
                "time_ratio": round(ratio, 2),
                "class": cls}
    if cls == "super-linear":
        flagged.append(name)

res = {
    "metric": "scale_slopes",
    "data_ratio": data_ratio,
    "sf_small": small.get("sf"), "sf_big": big.get("sf"),
    "total_small_sec": round(small["value"], 2),
    "total_big_sec": round(big["value"], 2),
    "total_time_ratio": round(big["value"] / small["value"], 2),
    "failed_big": big.get("failed", []),
    "super_linear": flagged,
    "queries": qs,
}
s = json.dumps(res, indent=1)
if out_path:
    open(out_path, "w").write(s + "\n")
print(s)
