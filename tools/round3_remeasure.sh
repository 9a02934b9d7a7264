#!/bin/bash
# Round-3 TPU re-measurement batch — run once when the relay is back.
# Sequence (each step logs + continues on failure):
#   1. verify drive: model_configuration --quick --fold-parallel
#   2. fold_parallel_bench sequential+stream (windowed dispatch numbers)
#   3. loss-sweep regeneration (bias-prior scoping changed dice-family)
#   4. bench.py headline
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round3_remeasure
mkdir -p "$LOG"

[ -d /tmp/vd/GT_masks ] || python -c "from segtpu.data.io import \
make_synthetic_dataset; make_synthetic_dataset('/tmp/vd', n_images=10, \
image_type='W')"

echo "=== 1/4 verify drive $(date)"
timeout 1500 python main.py --experiment model_configuration --quick \
    --fold-parallel --data-dir /tmp/vd --save-root /tmp/vout \
    > "$LOG/verify.log" 2>&1
echo "verify rc=$? (tail):"; tail -3 "$LOG/verify.log"

echo "=== 2/4 fold_parallel_bench $(date)"
timeout 1800 python tools/fold_parallel_bench.py 10 30 sequential,stream \
    > "$LOG/foldbench.log" 2>&1
echo "foldbench rc=$? (tail):"; tail -4 "$LOG/foldbench.log"

echo "=== 3/4 loss sweep regeneration $(date)"
timeout 3600 python tools/run_reference_scale.py loss \
    > "$LOG/losssweep.log" 2>&1
echo "losssweep rc=$? (tail):"; tail -5 "$LOG/losssweep.log"

echo "=== 4/4 bench.py $(date)"
timeout 1800 python bench.py > "$LOG/bench.log" 2>&1
echo "bench rc=$? :"; cat "$LOG/bench.log"

echo "=== DONE $(date)"
