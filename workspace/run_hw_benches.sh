#!/bin/bash
# Run hardware benchmarks sequentially on the real chip, waiting for
# relay recovery before each one (the axon relay wedges transiently —
# fetches block — and recovers after ~10-30 min). Keep the host CPU
# otherwise idle: a saturated core starves the relay client.
set -u
cd /root/repo
OUT=workspace/bench_results_r3
mkdir -p $OUT

probe() {
  for i in $(seq 1 30); do
    out=$(timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.arange(4)); print('PROBE_OK')" 2>/dev/null | tail -1)
    if [ "$out" = "PROBE_OK" ]; then return 0; fi
    sleep 90
  done
  return 1
}

for b in "$@"; do
  name=$(basename "$b" .py)
  if [ ! -f "$b" ] && [ -f "workspace/profiling/$b" ]; then
    cp "workspace/profiling/$b" "./_$b" && b="./_$b"
  fi
  echo "=== $b $(date +%H:%M:%S) ==="
  if ! probe; then echo "relay never recovered; skipping $b"; continue; fi
  timeout 580 python "$b" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "rc=$? tail:"
  tail -4 "$OUT/$name.out"
  grep -v WARNING "$OUT/$name.err" | tail -4
done
echo ALL_BENCHES_DONE
