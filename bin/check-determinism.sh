#!/usr/bin/env bash
# North-rule determinism evidence: run the FULL Verify query surface at two
# parallelism levels (2 and 8 cores by default) and require every query's
# output to be bit-identical after column+row sort. Regenerated each round;
# results belong in BENCH.md.
# Usage: bin/check-determinism.sh [sf_dir] [cpus_a] [cpus_b]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
A="${2:-2}"
B="${3:-8}"
OUT_A=$(mktemp -d /tmp/graft_det_a.XXXX)
OUT_B=$(mktemp -d /tmp/graft_det_b.XXXX)

echo "determinism check: $SF at cpus=$A vs cpus=$B"
SPARK_GRAFT_CPUS="$A" sbt -batch "runMain graft.Verify $SF $OUT_A" >/dev/null 2>&1
SPARK_GRAFT_CPUS="$B" sbt -batch "runMain graft.Verify $SF $OUT_B" >/dev/null 2>&1
python3 tools/check_determinism.py "$OUT_A" "$OUT_B"
rc=$?
rm -rf "$OUT_A" "$OUT_B"
exit $rc
