#!/usr/bin/env bash
# 10 M-row kill/rerun restart evidence for the committed pipeline paths:
# start the job, SIGKILL it mid-run, re-run with the same jobId, assert
# zero duplicate sink rows + counters equality vs the no-IO oracle.
# MODE=multi  → TokenPipeline.runMulti  (multi-match exploded sink table)
# MODE=exclusive → TokenPipeline.runExclusive (first-match single table)
# Usage: sbt -batch package && bin/restart-10m.sh [rows] [kill_after_secs] [mode]
set -euo pipefail
cd "$(dirname "$0")/.."
ROWS="${1:-10000000}"
KILL_AFTER="${2:-20}"
MODE="${3:-multi}"
IN="${SPARK_GRAFT_BENCH_DIR:-/tmp/graft_scaling_input}"
ROOT=$(mktemp -d /tmp/graft_restart.XXXX)
JAR=target/scala-2.13/vectorspark_2.13-0.1.0.jar
SUBMIT=/opt/spark/bin/spark-submit

case "$MODE" in
  multi)     RUN=--run;           CHK=--check;           DIR=multi ;;
  exclusive) RUN=--run-exclusive; CHK=--check-exclusive; DIR=exclusive ;;
  *) echo "mode must be multi|exclusive"; exit 2 ;;
esac

# reuse the scaling-bench materialized input if present at the right size
if [ ! -d "$IN" ]; then
  "$SUBMIT" --class graft.ScalingBench --master "local[32]" \
    --driver-memory 8g "$JAR" --materialize "$IN" "$ROWS" 2>/dev/null | grep MATERIALIZED
fi

echo "phase 1: start $MODE run, SIGKILL after ${KILL_AFTER}s (mid-run crash)"
"$SUBMIT" --class graft.RestartProbe --master "local[16]" --driver-memory 8g \
  "$JAR" "$RUN" "$IN" "$ROOT" "job-restart-10m-$MODE" > "$ROOT/run1.log" 2>&1 &
PID=$!
sleep "$KILL_AFTER"
if kill -9 "$PID" 2>/dev/null; then
  echo "killed pid $PID at t=${KILL_AFTER}s"
else
  echo "WARNING: run finished before the kill — restart path not exercised; rerun with a smaller kill_after"
fi
wait "$PID" 2>/dev/null || true
echo "committed state after crash:"; ls "$ROOT/$DIR"/_snapshots 2>/dev/null || echo "  (no commit yet)"

echo "phase 2: re-run same jobId + exactly-once check"
"$SUBMIT" --class graft.RestartProbe --master "local[16]" --driver-memory 8g \
  "$JAR" "$CHK" "$IN" "$ROOT" "job-restart-10m-$MODE" 2>/dev/null | grep CHECK
echo "restart probe PASS (root: $ROOT)"
