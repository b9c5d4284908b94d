#!/bin/bash
# Mid-round smoke gate (round-8 verdict ask #8): the full 295-query
# verify+oracle refresh is a ~6-minute round-close event; this runs a
# curated ~56-query subset (scripts/smoke_queries.txt — >=1 per query
# family, 2 for the big tiers, plus the known-heavy composites) through
# the SAME compile->Verify->DuckDB-compare path in ~1 minute.
#
# Usage: scripts/smoke.sh [sfDir]   (default sf0.01)
# Workflow: iterate with scripts/run_verify.sh on the queries you're
# touching, run smoke.sh before each commit, full close_round.sh at
# round end.
set -e -o pipefail # pipefail: `sbt compile | tail` must not mask a broken build
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=/tmp/smoke_out
LIST=$(paste -sd, scripts/smoke_queries.txt)
sbt -batch compile | tail -1
scripts/run_verify.sh "$SF" "$OUT" "$LIST" > /tmp/smoke_verify.log 2>&1 \
  || { tail -5 /tmp/smoke_verify.log; exit 1; }
python3 scripts/check.py "$SF" "$OUT"
