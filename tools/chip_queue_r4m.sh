#!/bin/bash
# Chip queue, round 4 part M — the unfinished R4l items plus the new
# PHASED_UP mid-stage upconv A/B.
#   1. train NEW DEFAULTS (einsum damsm + fused memread) + trace — vs the
#      83.31 ms/step comparator (.profiles/train_r4_patchmm, fused-damsm)
#      this isolates the DAMSM kernel inside the adversarial step.
#   2. train MEMREAD=jnp + trace — vs item 1 this isolates the memory-read
#      kernel's TRAIN value by device span (the round-1 "2.2x" was fence
#      fiction).
#   3. geneval defaults re-run — confirms the shipped defaults still
#      measure ~1641 on the driver-facing mode.
#   4. geneval PHASED_UP=1 — the mid-stage phase-space upconv A/B
#      (GAN.PHASED_UP, ops/image.py::up2x_bn_glu_phased).
#   5. gen-only PHASED_UP=1 — isolates the generator-side delta.
set -u
cd "$(dirname "$0")/.." || exit 1
log=${CHIPQ_LOG:-/tmp/chipq_r4m.log}
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() { # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag $(date)" >> "$log"
  "$@" >> "$log" 2>&1
  echo "rc=$? [$tag]" >> "$log"
}
echo "=== chip queue R4m start $(date)" >> "$log"
run "train b16 bf16 new defaults + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 \
  --dtype bf16 --trace .profiles/train_r4_defaults
run "train b16 bf16 MEMREAD=jnp + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_MEMREAD=jnp \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 \
  --dtype bf16 --trace .profiles/train_r4_jnpread
run "geneval defaults re-run" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20
run "geneval PHASED_UP=1" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_UP=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20
run "gen-only PHASED_UP=1" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_UP=1 \
  timeout 2700 python bench.py --mode gen --batch 128 --iters 20
echo "=== queue R4m done $(date)" >> "$log"
