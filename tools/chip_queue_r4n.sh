#!/bin/bash
# Chip queue, round 4 part N — the TRAIN-mode phased tail A/B
# (GAN.PHASED_TAIL_TRAIN, ops/image.py::phase_bn_glu_rgb_train).
#   1. train b16 bf16 PHASED_TAIL_TRAIN=1 + trace — vs the 83.11 ms/step
#      R4m defaults comparator (.profiles/train_r4_defaults).  The round-4
#      trace attributes ~22 ms/step to 256^2 ops (fwd+bwd x 2 caption
#      views); the phase form cuts the stage-3 upconv + RGB conv FLOPs 4x
#      in forward AND both gradients and removes the 268 MB activation
#      `reverse` passes of the dilated input gradient.
#   2. train b16 f32 PHASED_TAIL_TRAIN=1 — sanity at the f32 wall (no
#      trace; span tooling keyed to bf16 runs).
set -u
cd "$(dirname "$0")/.." || exit 1
log=${CHIPQ_LOG:-/tmp/chipq_r4n.log}
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() { # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag $(date)" >> "$log"
  "$@" >> "$log" 2>&1
  echo "rc=$? [$tag]" >> "$log"
}
echo "=== chip queue R4n start $(date)" >> "$log"
run "train b16 bf16 PHASED_TAIL_TRAIN=1 + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_TAIL_TRAIN=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 \
  --dtype bf16 --trace .profiles/train_r4_ptt
echo "=== queue R4n done $(date)" >> "$log"
