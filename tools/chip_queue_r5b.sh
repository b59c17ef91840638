#!/bin/bash
# Round-5 chip queue B: measure the round-5 train/DAMSM graph changes.
#   1. train b16 with the NEW defaults (PHASED_TAIL_TRAIN on + both
#      caption views batched through single CLIP text/vision applies)
#      vs the r5a comparators (defaults 83.11, PT-only 80.91 ms/step).
#   2. DAMSM b48 with the [2B] text-tower apply (comparator 29.40).
#   3. train batch scaling b32/b64: steps/sec falls but imgs/sec through
#      training is the honest production metric; the eval path hits ~71%
#      MFU at b128 so the train convs should fatten the same way.
# Run from anywhere:  bash tools/chip_queue_r5b.sh [logfile]
set -u
cd "$(dirname "$0")/.." || exit 1
log="${1:-${CHIPQ_LOG:-/tmp/chipq_r5b.log}}"

run() {
  local budget="$1"; shift
  echo "=== $(date -u +%H:%M:%S) $*" >> "$log"
  timeout "$budget" "$@" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
}

run 5400 python bench.py --mode train --batch 16 --dtype bf16 --iters 8 \
    --trace .profiles/train_r5b

if [ -d .profiles/train_r5b ]; then
  run 600 python tools/trace_decode.py .profiles/train_r5b --top 25
fi

run 3600 python bench.py --mode damsm --batch 48 --dtype bf16 --iters 8 \
    --trace .profiles/damsm_r5b

# compiled cost analysis of the new train graph (cache hit after item 1):
# flop + hbm floors for the structural-floor write-up
run 1800 python tools/train_cost.py --batch 16 --dtype bf16

run 5400 python bench.py --mode train --batch 32 --dtype bf16 --iters 8 \
    --trace .profiles/train_r5b_b32

run 5400 python bench.py --mode train --batch 64 --dtype bf16 --iters 6 \
    --trace .profiles/train_r5b_b64

echo "=== $(date -u +%H:%M:%S) QUEUE DONE" >> "$log"
