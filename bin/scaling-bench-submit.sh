#!/usr/bin/env bash
# North-rule scaling evidence via spark-submit (the literal form named in
# BASELINE.json north_star): the identical job submitted at N and 4N
# parallelism, each pinned to its own CPU set. Usage:
#   sbt -batch package && bin/scaling-bench-submit.sh [rows]
set -euo pipefail
cd "$(dirname "$0")/.."
ROWS="${1:-10000000}"
DIR="${SPARK_GRAFT_BENCH_DIR:-/tmp/graft_scaling_input}"
JAR=target/scala-2.13/vectorspark_2.13-0.1.0.jar
SUBMIT=/opt/spark/bin/spark-submit

# one-time input materialization (untimed)
taskset -c 0-31 "$SUBMIT" --class graft.ScalingBench --master "local[32]" \
  --driver-memory 8g "$JAR" --materialize "$DIR" "$ROWS" 2>/dev/null | grep MATERIALIZED

run_level() { # cores
  local n="$1"
  taskset -c "0-$((n - 1))" "$SUBMIT" --class graft.ScalingBench \
    --master "local[$n]" --driver-memory 8g "$JAR" \
    --child "$n" "$DIR" "$ROWS" 2>/dev/null | grep CHILD
}

L8=$(run_level 8)
L2=$(run_level 2)
RPS8=$(echo "$L8" | awk '{print $4}')
RPS2=$(echo "$L2" | awk '{print $4}')
EFF=$(python3 -c "print(round($RPS8 / $RPS2 / 4.0, 3))")
echo "N  (2 cores): $L2"
echo "4N (8 cores): $L8"
echo "scaling efficiency N->4N: $EFF (target >= 0.8)"
