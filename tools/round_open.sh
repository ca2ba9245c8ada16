#!/usr/bin/env bash
# Round-open evidence-chain commit: the driver writes BENCH_r{N}.json /
# CORRECTNESS_r{N}.json (and rewrites BENCH.json / LEAKCHECK.json /
# VERDICT.md / ADVICE.md) BETWEEN rounds, so at round open they are the
# authoritative prior-round artifacts and must be committed before any
# new work dirties the tree. Run this as the FIRST action of a round.
#
# Usage: tools/round_open.sh <round-number-just-closed>
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
N="${1:?usage: round_open.sh <closed-round-number>}"

FILES=()
for f in BENCH_r*.json CORRECTNESS_r*.json SCALE_r*.json BENCH.json \
         BENCHWIDE.json BENCHWIDE_DIFF_r*.json LEAKCHECK.json COPYCHECK.json \
         STREAMBENCH*.json VERDICT.md ADVICE.md; do
  [ -e "$f" ] || continue
  if ! git diff --quiet -- "$f" 2>/dev/null || \
     [ -n "$(git ls-files --others --exclude-standard -- "$f")" ]; then
    FILES+=("$f")
  fi
done

if [ ${#FILES[@]} -eq 0 ]; then
  echo "round_open: evidence chain already clean — nothing to commit"
  exit 0
fi

git add -- "${FILES[@]}"
git commit -m "round ${N}: commit driver evidence artifacts at round open

No-Verification-Needed: artifact-only commit (driver-generated JSON/MD)"
echo "round_open: committed ${#FILES[@]} artifact(s): ${FILES[*]}"
