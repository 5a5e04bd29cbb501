#!/bin/bash
# Run every hardware benchmark sequentially on the real chip, logging
# to workspace/bench_results_r3/. Run only when the CPU is otherwise
# idle — a saturated host starves the relay client and reads as a
# wedged device.
set -u
cd /root/repo
OUT=workspace/bench_results_r3
mkdir -p $OUT
for b in "$@"; do
  echo "=== $b $(date +%H:%M:%S) ==="
  timeout 580 python "$b" > "$OUT/${b%.py}.out" 2> "$OUT/${b%.py}.err"
  echo "rc=$? tail:"
  tail -3 "$OUT/${b%.py}.out"
done
