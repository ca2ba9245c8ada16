#!/usr/bin/env bash
# Interleaved two-leg fresh-JVM A/B for headline-bench regression
# adjudication (the protocol that settled the round-9 wide flags, see
# BENCHWIDE_DIFF_r9.json). A = pre-change binary (classes dir in $1)
# with the CURRENT bench protocol overlaid (per-pass GC — otherwise the
# old leg is contaminated by ContextCleaner starvation and the
# comparison biases toward "no regression"); B = current binary.
# Legs run A,B,A,B, one fresh JVM each, 5 warm passes; the arbiter is
# min-of-legs per query per side (min is the right estimator for a
# lower-bounded timing corrupted by one-sided noise).
#
# Usage: ab_headline.sh <old-classes-dir> <q1,q2,...> <outdir>
set -euo pipefail
OLD="${1:?old classes dir}"; QS="${2:?query list}"; OUT="${3:?outdir}"
NEW=/root/repo/target/scala-2.13/classes
mkdir -p "$OUT"
run() { # $1=classes $2=tag
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_WARM_RUNS=5 \
  SPARK_GRAFT_BENCH_OUT="$OUT/$2.json" \
  java -Xmx16g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "/opt/spark/jars/*:$1" graft.Bench > "$OUT/$2.log" 2>&1
  echo "leg $2 done"
}
run "$OLD" A1
run "$NEW" B1
run "$OLD" A2
run "$NEW" B2
python3 - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
legs = {t: json.load(open(os.path.join(out, t + ".json"))) for t in ("A1","B1","A2","B2")}
qs = sorted(legs["A1"]["queries"])
print(f"{'query':32s} {'A_min':>7s} {'B_min':>7s} {'delta':>7s}  legA(spread)  legB(spread)")
res = {}
for q in qs:
    a = [legs["A1"]["queries"][q], legs["A2"]["queries"][q]]
    b = [legs["B1"]["queries"][q], legs["B2"]["queries"][q]]
    amin, bmin = min(a), min(b)
    d = bmin / amin - 1
    sa = abs(a[0]-a[1])/amin; sb = abs(b[0]-b[1])/bmin
    res[q] = {"a_min": amin, "b_min": bmin, "delta": d, "spread_a": sa, "spread_b": sb}
    print(f"{q:32s} {amin:7.3f} {bmin:7.3f} {d:+7.1%}  {a[0]:.3f}/{a[1]:.3f} ({sa:.0%})  {b[0]:.3f}/{b[1]:.3f} ({sb:.0%})")
json.dump(res, open(os.path.join(out, "ab_summary.json"), "w"), indent=1)
EOF
