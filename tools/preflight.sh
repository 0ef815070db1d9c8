#!/usr/bin/env bash
# Pre-snapshot gate — run as the LAST action of every session, before
# the round ends. A round-8 postmortem: the end-of-round snapshot swept
# in a never-compiled WIP query, sbt failed at compile, and the whole
# round's driver verification was voided. This script makes that class
# of failure impossible: it refuses to pass unless the EXACT current
# tree compiles (main + test), every registered query dumps, and every
# dump hash-matches its DuckDB oracle twin.
#
# Usage:
#   tools/preflight.sh              # full gate at sf0.01 (the driver's tier)
#   tools/preflight.sh sf0.001      # quick gate on the smoke tier
#   tools/preflight.sh sf0.01 q193_crosscorrelation q84_cms_counts
#                                   # gate only the named queries (iteration)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-sf0.01}"
shift || true
SF_DIR="/root/testdata/$SF"
OUT_DIR="/tmp/preflight_verify_$SF"

echo "== preflight 1/4: sbt Test/compile (main + test must compile at HEAD+worktree)"
sbt -batch "Test/compile" >/tmp/preflight_compile.log 2>&1 \
  || { tail -30 /tmp/preflight_compile.log; echo "PREFLIGHT FAIL: compile"; exit 1; }

echo "== preflight 2/4: graft.Verify → $OUT_DIR ($SF)"
rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR $*" >/tmp/preflight_verify.log 2>&1 \
  || { tail -30 /tmp/preflight_verify.log; echo "PREFLIGHT FAIL: verify"; exit 1; }
if grep -q '\[verify\].*failed' /tmp/preflight_verify.log; then
  grep '\[verify\].*failed' /tmp/preflight_verify.log
  echo "PREFLIGHT FAIL: one or more queries threw during dump"
  exit 1
fi

# a typo'd query name must be a hard failure, not a vacuous pass: Verify
# silently dumps nothing for unknown names and compare_oracle silently
# skips them, so check every requested name produced a dump directory
for q in "$@"; do
  [ -d "$OUT_DIR/$q" ] \
    || { echo "PREFLIGHT FAIL: no dump for '$q' (unknown query name?)"; exit 1; }
done

echo "== preflight 3/4: oracle type lint (DESCRIBE all twins vs tools/oracle_schema.json)"
python3 tools/lint_oracle_types.py "$OUT_DIR" "$SF_DIR" \
  || { echo "PREFLIGHT FAIL: oracle type drift (cast the twin, or --regen after an intentional schema change)"; exit 1; }

echo "== preflight 4/4: DuckDB oracle compare"
COMPARE_OUT=$(python3 tools/compare_oracle.py "$OUT_DIR" "$SF_DIR" "$@") \
  || { echo "$COMPARE_OUT"; echo "PREFLIGHT FAIL: oracle mismatch"; exit 1; }
echo "$COMPARE_OUT"
# vacuous-pass guard: zero compared queries is a failure, and a partial
# run must compare exactly the requested names
PASSED=$(echo "$COMPARE_OUT" | sed -n 's/^\([0-9]*\) passed.*/\1/p' | tail -1)
[ -n "$PASSED" ] && [ "$PASSED" -gt 0 ] \
  || { echo "PREFLIGHT FAIL: zero queries compared"; exit 1; }
if [ "$#" -gt 0 ] && [ "$PASSED" -ne "$#" ]; then
  echo "PREFLIGHT FAIL: requested $# queries, only $PASSED compared"
  exit 1
fi

echo "PREFLIGHT PASS ($SF, $PASSED queries oracle-green)"
