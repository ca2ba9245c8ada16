#!/usr/bin/env bash
# Same-window sharded wide-sweep A/B, interleaved at SHARD granularity:
# A0,B0,A1,B1,...  Each compared shard pair executes minutes apart
# instead of a full sweep apart, so the box-drift exposure per per-query
# ratio drops from ~40 min (sequential A then B) to one shard length —
# the same interleaving discipline SCALE.md's hand A/B protocol uses.
# The first sequential attempt (r14: A total 838 s, B total 1390 s, box
# slowed ~1.66x between sweeps) is exactly the failure mode this
# retires.
#
# Usage: tools/benchwide_ab.sh [outA.json] [outB.json] [numShards] [xmx]
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
OUT_A="${1:-/tmp/benchwide_A.json}"
OUT_B="${2:-/tmp/benchwide_B.json}"
N="${3:-4}"
XMX="${4:-48g}"
TMP_A="$(mktemp -d /tmp/benchwide_ab_A.XXXXXX)"
TMP_B="$(mktemp -d /tmp/benchwide_ab_B.XXXXXX)"

for ((i = 0; i < N; i++)); do
  for leg in A B; do
    tmp_var="TMP_${leg}"
    dir="${!tmp_var}"
    echo "benchwide_ab: shard $i/$N leg $leg (fresh JVM)..." >&2
    tools/graft_java.sh "$XMX" graft.BenchWide "$dir/shard$i.json" "$i" "$N" \
      > "$dir/shard$i.log" 2>&1 || {
        echo "benchwide_ab: shard $i leg $leg FAILED — see $dir/shard$i.log" >&2
        exit 1
      }
  done
done

python3 tools/merge_benchwide.py "$OUT_A" "$TMP_A"/shard*.json
python3 tools/merge_benchwide.py "$OUT_B" "$TMP_B"/shard*.json
echo "benchwide_ab: wrote $OUT_A and $OUT_B (shards kept in $TMP_A, $TMP_B)" >&2
