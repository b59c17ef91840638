#!/bin/bash
# Chip queue, round 4 part K — device-span measurements (the trustworthy
# timing source; walls through the contended tunnel host measured 9x too
# fast AND 20x too slow this round).  All three runs print a second JSON
# line with the trace-span steps/sec.
#   1. train b16 bf16 + trace — with the PatchEmbed matmul rewrite
#      (comparator: 124.4 ms/step device span on the conv form,
#      .profiles/train_r4; the two 20.6 ms patch-embed backward fusions
#      should be gone).
#   2. damsm b48 bf16 + trace — new-graph span (comparator 30.4 ms/step).
#   3. damsm b48 bf16 FUSED_DAMSM=0 + trace — honest kernel A/B (the
#      round-1 "2.7x" was measured with the broken fence).
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
echo "=== chip queue R4k start $(date)" >> "$log"
run "train b16 bf16 patchmm + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 \
  --dtype bf16 --trace .profiles/train_r4_patchmm
run "damsm b48 bf16 patchmm + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 20 \
  --dtype bf16 --trace .profiles/damsm_r4_patchmm
run "damsm b48 bf16 FUSED_DAMSM=0 + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_FUSED_DAMSM=0 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 20 \
  --dtype bf16 --trace .profiles/damsm_r4_nofused
echo "=== queue R4k done $(date)" >> "$log"
