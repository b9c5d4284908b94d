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
# Ratio refresh (round-7 verdict ask #1): every registered query ships
# with a DuckDB baseline ratio. baseline_wall.py is incremental — it
# re-times only queries whose oracle SQL changed (sha-tracked) or that
# are new, so a no-change run costs one oracle dump + two json joins.
SF_DIR=${SF_DIR:-/root/testdata/sf0.1}
# Suite-wall drift gate (round-9 verdict ask #7): a >10% like-for-like
# drift from the last committed bench blocks the close until attributed
# (WALL_GUARD_OK=1 acknowledges a diagnosed drift; adjudicate in
# BASELINE.md first). Runs BEFORE the ratio refresh so a bad total
# never silently becomes the new baseline.
if [ -f BENCH_LOCAL.json ] && [ "${SKIP_GUARD:-}" != "1" ]; then
  python3 scripts/wall_guard.py BENCH_LOCAL.json
fi
# Numeric-contract smoke at BOTH scale factors (round-9 verdict ask #8):
# check.py rules 4-5 (decimal overflow, boundary rounding) only surface
# at sf0.1 cardinalities — the sf0.01 gate alone missed them in r9.
if [ "${SKIP_SMOKE:-}" != "1" ]; then
  echo "close_round: smoke at sf0.01 + sf0.1"
  scripts/smoke.sh /root/testdata/sf0.01
  scripts/smoke.sh /root/testdata/sf0.1
fi
if [ -f BENCH_LOCAL.json ] && [ "${SKIP_RATIO:-}" != "1" ]; then
  echo "close_round: refreshing DuckDB baseline + ratios"
  scripts/run_verify.sh "$SF_DIR" /tmp/close_round_oracle __oracle_only__ \
    >/dev/null 2>&1 || echo "close_round: oracle dump failed (stale build?)"
  if [ -f /tmp/close_round_oracle/oracle_sql.json ]; then
    python3 scripts/baseline_wall.py "$SF_DIR" \
      /tmp/close_round_oracle/oracle_sql.json BASELINE_LOCAL.json \
      || echo "close_round: baseline_wall reported errors (recorded)"
    python3 scripts/bench_ratio.py BENCH_LOCAL.json BASELINE_LOCAL.json \
      BENCH_RATIO.json || echo "close_round: bench_ratio failed"
  fi
fi
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
