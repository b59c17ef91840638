#!/bin/bash
# Round-5 chip queue C: A/B the remat lever (GAN.REMAT) on the HBM-bound
# adversarial step.  Comparators (queue r5b, device trace spans, shipped
# defaults): b16 77.53 ms/step, b32 146.63 ms/step (218.2 imgs/sec).
# Hypothesis: the step is bandwidth-bound (75.1 GB operand bytes vs a
# 30 ms FLOP floor), so jax.checkpoint'ing the big forwards (G / D trunks
# / CLIP vision on fakes) converts saved-activation HBM round trips into
# spare MXU FLOPs.
# Run from anywhere:  bash tools/chip_queue_r5c.sh [logfile]
set -u
cd "$(dirname "$0")/.." || exit 1
log="${1:-${CHIPQ_LOG:-/tmp/chipq_r5c.log}}"

run() {
  local budget="$1"; shift
  echo "=== $(date -u +%H:%M:%S) $*" >> "$log"
  timeout "$budget" "$@" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
}

run 5400 env T2IGAN_REMAT=g python bench.py --mode train --batch 16 \
    --dtype bf16 --iters 8 --trace .profiles/train_r5c_rg

run 5400 env T2IGAN_REMAT=all python bench.py --mode train --batch 16 \
    --dtype bf16 --iters 8 --trace .profiles/train_r5c_rall

# both variants at the b32 production sweet spot
run 5400 env T2IGAN_REMAT=g python bench.py --mode train --batch 32 \
    --dtype bf16 --iters 8 --trace .profiles/train_r5c_rg_b32

run 5400 env T2IGAN_REMAT=all python bench.py --mode train --batch 32 \
    --dtype bf16 --iters 8 --trace .profiles/train_r5c_rall_b32

for d in train_r5c_rg train_r5c_rall train_r5c_rg_b32 train_r5c_rall_b32; do
  if [ -d ".profiles/$d" ]; then
    run 600 python tools/trace_decode.py ".profiles/$d" --top 20
  fi
done

echo "=== $(date -u +%H:%M:%S) QUEUE DONE" >> "$log"
