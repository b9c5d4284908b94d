#!/bin/bash
# Round-close artifact commit — mechanical hygiene so bench/correctness
# artifacts are never dirty or untracked at the judge's snapshot
# (missed by hand in rounds 3-6; automated per the round-6 verdict).
#
# Usage: scripts/close_round.sh [extra files...]
# Stages every known round artifact that exists (tracked-and-dirty or
# untracked alike), plus any extras passed, and commits if anything is
# staged. Safe to run repeatedly: a no-change run commits nothing.
set -e
cd "$(dirname "$0")/.."
ARTIFACTS=(BENCH_r*.json CORRECTNESS_r*.json BENCH_LOCAL.json \
  BENCH_LOCAL.partial.json LEAKCHECK.json BASELINE_LOCAL.json \
  BENCH_RATIO.json COPYCHECK.json VERDICT.md ADVICE.md PROGRESS.jsonl)
shopt -s nullglob
to_add=()
for a in "${ARTIFACTS[@]}" "$@"; do
  for f in $a; do
    # skip gitignored artifacts (e.g. PROGRESS.jsonl) — one ignored
    # path would fail the whole git add under set -e
    [ -e "$f" ] && ! git check-ignore -q "$f" && to_add+=("$f")
  done
done
if [ ${#to_add[@]} -eq 0 ]; then
  echo "close_round: no artifacts present"; exit 0
fi
git add -- "${to_add[@]}"
if git diff --cached --quiet; then
  echo "close_round: artifacts already committed, nothing to do"
  exit 0
fi
git commit -m "Commit round artifacts (bench/correctness/baseline maps)"
echo "close_round: committed $(git diff-tree --no-commit-id --name-only -r HEAD | wc -l) files"
