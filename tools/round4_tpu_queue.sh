#!/bin/bash
# Round-4 TPU work queue: waits for the relay, then runs every chip job
# in priority order. Each job is bounded; a failure doesn't stop the
# queue. Designed to be launched once in the background at round start
# (the relay had been down for hours at 2026-08-18 08:30).
#
#   1. bench.py            — BENCH_r04 capture (VERDICT #1), runs FIRST
#                            and alone so timings are uncontended
#   2. train_bytes_profile — HBM bytes attribution 512²/bs128 (VERDICT #2)
#   3. fused_block_bench   — guarded Pallas decoder-pair measurement (#3)
#
# Log: /tmp/r4_queue.log ; artifacts land in the repo.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_queue.log
exec >> "$LOG" 2>&1

echo "=== round4 TPU queue started $(date -Is) ==="

probe() {
  timeout 180 python - <<'EOF'
import threading, os
t = threading.Timer(120, lambda: os._exit(3)); t.daemon = True; t.start()
import jax, jax.numpy as jnp
jax.device_get(jnp.zeros(()) + 1.0)
os._exit(0)
EOF
}

# wait up to 11h for the relay
DEADLINE=$(( $(date +%s) + 39600 ))
n=0
until probe; do
  n=$((n+1))
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "queue: relay never came back ($n probes) — giving up $(date -Is)"
    exit 3
  fi
  echo "queue: probe $n failed $(date -Is); sleeping 480s"
  sleep 480
done
echo "queue: relay UP after $n failed probes $(date -Is)"

echo "--- job 1: bench.py ---"
BENCH_RETRY_WINDOW=1800 timeout 3600 python bench.py > /tmp/bench_r4_queue.json
rc=$?
echo "bench rc=$rc"; cat /tmp/bench_r4_queue.json

echo "--- job 2: train_bytes_profile 512²/bs128 ---"
timeout 3000 python tools/train_bytes_profile.py --size 512 --batch 128 \
    --out TRAIN_BYTES_512_BS128.json
echo "profile rc=$?"

echo "--- job 3: fused_block_bench ---"
timeout 3600 python tools/fused_block_bench.py --bs 8
echo "fused_block rc=$?"

echo "=== round4 TPU queue done $(date -Is) ==="
