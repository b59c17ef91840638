#!/bin/bash
# Chip queue, round 4 part L — honest memory-read train A/B + headline
# re-confirmation on the new defaults.
# Comparator: 83.31 ms/step (.profiles/train_r4_patchmm) measured with
# fused-damsm + fused-memread (the defaults at the time).
#   1. train NEW DEFAULTS (einsum damsm + fused memread) + trace — vs the
#      comparator this isolates the DAMSM kernel inside the adversarial
#      step (the DAMSM loss rides inside the G update).
#   2. train MEMREAD=jnp (einsum damsm) + trace — vs item 1 this isolates
#      the memory-read kernel's TRAIN value by device span (the round-1
#      "2.2x" claim was fence fiction).
#   3. geneval defaults re-run — confirms the shipped defaults (phased
#      tail ON, einsum DAMSM) still measure ~1641 on the driver-facing
#      mode.
set -u
cd "$(dirname "$0")/.." || exit 1
log=${CHIPQ_LOG:-/tmp/chipq_r4.log}
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() { # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag $(date)" >> "$log"
  "$@" >> "$log" 2>&1
  echo "rc=$? [$tag]" >> "$log"
}
echo "=== chip queue R4l start $(date)" >> "$log"
run "train b16 bf16 new defaults + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 \
  --dtype bf16 --trace .profiles/train_r4_defaults
run "train b16 bf16 MEMREAD=jnp + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_MEMREAD=jnp \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 \
  --dtype bf16 --trace .profiles/train_r4_jnpread
run "geneval defaults re-run" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20
echo "=== queue R4l done $(date)" >> "$log"
