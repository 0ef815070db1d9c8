#!/bin/bash
# Standing bench campaign (round-13 protocol, r12 verdict item 6): run
# graft.Bench repeatedly and archive each attempt's metric lines — the
# full per-query map, the composed_pipeline detail line and the summary
# — under tools/bench_runs_r$ROUND/attempt_$i.jsonl, so the
# min-ensemble derivation's raw inputs are REPO artifacts that survive
# the sandbox (the r12 campaign's /tmp inputs did not). Resume-friendly:
# attempts that already have a non-empty file are skipped, so a killed
# campaign continues where it stopped. Finishes by writing the
# per-query min-ensemble to $DIR/min_ensemble.json.
#
# Usage: ROUND=13 ATTEMPTS=12 tools/bench_campaign.sh
set -u
ROUND=${ROUND:?set ROUND=<n>}
ATTEMPTS=${ATTEMPTS:-12}
HERE=$(cd "$(dirname "$0")" && pwd)
DIR=$HERE/bench_runs_r$ROUND
mkdir -p "$DIR"
exec 9>/tmp/bench_campaign.lock
flock -n 9 || { echo "another campaign is running" >&2; exit 1; }
for i in $(seq 1 "$ATTEMPTS"); do
  out=$DIR/attempt_$i.jsonl
  [ -s "$out" ] && continue
  echo "=== attempt $i $(date +%T) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$out"
  grep '"metric":"total"' "$out" >&2
done
python3 "$HERE/min_ensemble.py" "$DIR"/attempt_*.jsonl --json \
  > "$DIR/min_ensemble.json"
echo "ensemble -> $DIR/min_ensemble.json" >&2
