#!/usr/bin/env bash
# Stress test: striped parallel benchmark clients against a running server
# (equivalent of reference scripts/stress_test.sh, whose stress_test.py was
# missing from the snapshot; this uses the --shard/--num-shards striping of
# run_benchmark_parallel.py:104).
set -euo pipefail

BENCHMARK="${1:-SYNTHETIC}"
ROUTING="${2:-all}"
NUM_CLIENTS="${3:-4}"
PARALLEL="${4:-8}"
shift 4 || true

pids=()
for ((i = 0; i < NUM_CLIENTS; i++)); do
  python "$(dirname "$0")/../run_benchmark.py" \
    --benchmark "$BENCHMARK" --routing "$ROUTING" \
    --parallel "$PARALLEL" --shard "$i" --num-shards "$NUM_CLIENTS" \
    --save-logs-dir "data/logs/stress_$i" "$@" &
  pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done
echo "stress test complete ($NUM_CLIENTS clients x $PARALLEL parallel)"
