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
else
  git add -- "${FILES[@]}"
  git commit -m "round ${N}: commit driver evidence artifacts at round open

No-Verification-Needed: artifact-only commit (driver-generated JSON/MD)"
  echo "round_open: committed ${#FILES[@]} artifact(s): ${FILES[*]}"
fi

# Pinned oracle-fuzz gate (round 12, VERDICT r11 #3): the degenerate-corpus
# recipes that have caught real engine≡oracle contract drift run at EVERY
# round open — ~5 min wall (4 concurrent 8-core trials), loud failure.
# Skip only with SPARK_GRAFT_SKIP_FUZZ_CI=1 (e.g. when classes are stale).
if [ "${SPARK_GRAFT_SKIP_FUZZ_CI:-0}" != "1" ]; then
  if [ ! -d target/scala-2.13/classes/graft ]; then
    echo "round_open: classes not compiled — run 'sbt compile' then" \
         "'python3 tools/fuzz_oracle.py --ci' before building on this round" >&2
    exit 1
  fi
  # Stale-class guard (ADVICE r12): classes that merely EXIST can be
  # compiled from older sources, and the fuzz gate would then silently
  # validate old code. Compare newest source vs newest class mtime.
  # xargs -r + || true (ADVICE r13): under pipefail an empty match made
  # `xargs stat` exit nonzero and killed the script AT the assignment,
  # so the explicit -z diagnostic below was unreachable.
  NEWEST_SRC=$(find src/main -name '*.scala' -o -name '*.java' | \
               { xargs -r stat -c %Y 2>/dev/null || true; } | sort -n | tail -1)
  NEWEST_CLS=$(find target/scala-2.13/classes -name '*.class' | \
               { xargs -r stat -c %Y 2>/dev/null || true; } | sort -n | tail -1)
  if [ -z "${NEWEST_CLS:-}" ] || [ "${NEWEST_SRC:-0}" -gt "$NEWEST_CLS" ]; then
    echo "round_open: compiled classes are OLDER than src/main sources —" \
         "run 'sbt compile' first so the fuzz gate validates current code" >&2
    exit 1
  fi
  echo "round_open: running pinned oracle-fuzz CI subset..."
  python3 tools/fuzz_oracle.py --ci
  echo "round_open: fuzz CI subset green"
fi
