#!/usr/bin/env bash
# Min-of-legs sharded wide sweep + same-window self-qualification
# (round 14, third protocol iteration).
#
# Measured failure modes this retires:
#   - sequential sweep pair: box slowed 1.66x between sweeps
#   - single-leg shard-interleaved pair: per-query cold times swing up
#     to 5x minutes apart (q251 3.8 -> 20.5 s), so the per-shard spread
#     signature never repeats and the diff rightly refuses flags
#
# Protocol: per shard, four fresh-JVM legs in ABBA order (A,B,B,A —
# symmetric page-cache exposure: each side gets one cache-cold-biased
# and one cache-warm position). Snapshot E = per-query min of the A
# legs, F = min of the B legs (tools/min_shards.py), and the committed
# BENCHWIDE snapshot = min over all four legs. diff(E, F) is the
# same-window self-test: E and F are independent min-of-2 estimates of
# the same box, so if THEY don't qualify, no same-protocol pair will.
#
# Usage: tools/benchwide_quad.sh [outSnapshot] [outE] [outF] [numShards] [xmx]
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
OUT="${1:-BENCHWIDE.json}"
OUT_E="${2:-/tmp/benchwide_E.json}"
OUT_F="${3:-/tmp/benchwide_F.json}"
N="${4:-4}"
XMX="${5:-48g}"
TMP="$(mktemp -d /tmp/benchwide_quad.XXXXXX)"

run_leg() { # shard leg-name
  echo "benchwide_quad: shard $1/$N leg $2 (fresh JVM)..." >&2
  tools/graft_java.sh "$XMX" graft.BenchWide "$TMP/shard$1_$2.json" "$1" "$N" \
    > "$TMP/shard$1_$2.log" 2>&1 || {
      echo "benchwide_quad: shard $1 leg $2 FAILED — see $TMP/shard$1_$2.log" >&2
      exit 1
    }
}

for ((i = 0; i < N; i++)); do
  for leg in A1 B1 B2 A2; do   # ABBA
    run_leg "$i" "$leg"
  done
  python3 tools/min_shards.py "$TMP/E_shard$i.json" \
    "$TMP/shard${i}_A1.json" "$TMP/shard${i}_A2.json"
  python3 tools/min_shards.py "$TMP/F_shard$i.json" \
    "$TMP/shard${i}_B1.json" "$TMP/shard${i}_B2.json"
  python3 tools/min_shards.py "$TMP/S_shard$i.json" \
    "$TMP/shard${i}_A1.json" "$TMP/shard${i}_B1.json" \
    "$TMP/shard${i}_B2.json" "$TMP/shard${i}_A2.json"
done

python3 tools/merge_benchwide.py "$OUT_E" "$TMP"/E_shard*.json
python3 tools/merge_benchwide.py "$OUT_F" "$TMP"/F_shard*.json
python3 tools/merge_benchwide.py "$OUT" "$TMP"/S_shard*.json
echo "benchwide_quad: snapshot $OUT (min-of-4), self-test pair $OUT_E / $OUT_F (legs kept in $TMP)" >&2
