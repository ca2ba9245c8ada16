#!/usr/bin/env bash
# Interleaved fresh-JVM A/B of the shuffle-partition rule on the
# checkpoint-heavy funnel family (round 13, VERDICT r12 #4): the
# 128-partition rule is fit-proven and faster for the GRAPH family
# (SCALE_r12 q227_partitions_ab_48g), but the session default stayed 32
# on the strength of an old 8x-INITIAL-partitions q119 regression
# (23 s -> 77 s, r8 binary). This re-proves or retires that blocker on
# the CURRENT binary: legs P32 (today's default), P128 (the candidate
# rule), P256I (the original regression config: initialPartitionNum=256,
# shuffle=32), interleaved P32,P128,P256I,P32,P128,P256I — one fresh JVM
# each, cold + 3 warm, min-of-legs arbiter (same-hour interleaving is
# the only drift-valid protocol on this box; see SCALE.md).
#
# Usage: tools/ab_partitions.sh <sfDir> <q1,q2,...> <outdir> [xmx]
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
SF="${1:?sf dir}"; QS="${2:?query list}"; OUT="${3:?outdir}"; XMX="${4:-48g}"
mkdir -p "$OUT"

leg() { # $1=tag $2=shuffle-parts $3=initial-parts(optional)
  local tag="$1" parts="$2" init="${3:-}"
  local env=(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32
             SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_WARM_RUNS="${AB_WARM_RUNS:-3}"
             SPARK_GRAFT_BENCH_OUT="$OUT/$tag.json"
             SPARK_GRAFT_SHUFFLE_PARTITIONS="$parts")
  [ -n "$init" ] && env+=(SPARK_GRAFT_INITIAL_PARTITIONS="$init")
  env "${env[@]}" tools/graft_java.sh "$XMX" graft.Bench \
    > "$OUT/$tag.log" 2>&1 || echo "leg $tag FAILED (rc=$?)" | tee -a "$OUT/failures"
  echo "leg $tag done"
}

# ADVICE r13: a failed leg leaves no (or a PREVIOUS run's) P*.json in
# $OUT — clear stale artifacts so the summary can only see this run's
# legs, and make missing legs loud instead of silently mixed in.
rm -f "$OUT"/P*.json "$OUT"/P*.log "$OUT"/failures

ROUNDS="${AB_ROUNDS:-2}"
for round in $(seq 1 "$ROUNDS"); do
  leg "P32_$round" 32
  leg "P128_$round" 128
  leg "P256I_$round" 32 256
done

AB_ROUNDS="$ROUNDS" python3 - "$OUT" <<'EOF'
import json, sys, os, glob
out = sys.argv[1]
expected = int(os.environ.get("AB_ROUNDS", "2"))
legs = {}
for f in glob.glob(os.path.join(out, "P*.json")):
    tag = os.path.basename(f)[:-5]
    legs[tag] = json.load(open(f))
if not legs:
    sys.exit("ab_partitions: NO legs produced any output — every leg failed")
cfgs = sorted({t.rsplit("_", 1)[0] for t in legs})
# a leg that failed mid-run may carry a different query set; use the
# intersection and warn, so the table never KeyErrors on a partial leg
qsets = [set(l["queries"]) for l in legs.values()]
qs = sorted(set.intersection(*qsets))
if qs != sorted(set.union(*qsets)):
    print(f"ab_partitions: WARNING legs ran different query sets; "
          f"summarizing the {len(qs)}-query intersection", file=sys.stderr)
warn = []
for c in sorted(set(cfgs) | {"P32", "P128", "P256I"}):
    n = sum(1 for t in legs if t.startswith(c + "_"))
    if n < expected:
        warn.append(f"{c}: {n}/{expected} legs")
if warn:
    print(f"ab_partitions: WARNING missing legs ({'; '.join(warn)}) — "
          "min-of-legs is computed over the legs that RAN", file=sys.stderr)
res = {"_legs_expected": expected,
       "_legs_present": {c: sorted(t for t in legs if t.startswith(c + "_"))
                         for c in cfgs}}
print(f"{'query':28s} " + " ".join(f"{c+'_min':>11s}" for c in cfgs))
for q in qs:
    row = {}
    for c in cfgs:
        vals = [legs[t]["queries"][q] for t in legs if t.startswith(c + "_")]
        row[c] = {"min": min(vals), "legs": vals}
    res[q] = row
    print(f"{q:28s} " + " ".join(f"{row[c]['min']:11.3f}" for c in cfgs))
json.dump(res, open(os.path.join(out, "ab_summary.json"), "w"), indent=1)
EOF
