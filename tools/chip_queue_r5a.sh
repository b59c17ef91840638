#!/bin/bash
# Round-5 chip queue A: the MFU-constant microbenchmark, the train-step
# trace re-capture (copy-sea quantification, VERDICT #1), the
# PHASED_TAIL_TRAIN full-graph A/B, the DAMSM trace decode (VERDICT #6),
# and the geneval defaults re-warm.  ADVICE round-4 fixes applied:
#   - cold-compile items get a 5400s budget (the adversarial graph alone
#     took >25 min cold through the relay and was killed at 1800s);
#   - geneval runs with T2IGAN_BENCH_NO_SUPERVISE=1 so the shell timeout
#     owns the budget (no supervisor-inside-timeout kill race);
#   - decode items are guarded on their trace dir existing;
#   - CHIPQ_LOG env override kept for wrappers.
# Run from anywhere:  bash tools/chip_queue_r5a.sh [logfile]
set -u
cd "$(dirname "$0")/.." || exit 1
log="${1:-${CHIPQ_LOG:-/tmp/chipq_r5a.log}}"

run() {
  local budget="$1"; shift
  echo "=== $(date -u +%H:%M:%S) $*" >> "$log"
  timeout "$budget" "$@" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
}

# 1. pin the chip's achievable bf16 matmul peak (decides 197 vs 394)
run 1800 python tools/microbench_peak.py --trace .profiles/peak_r5

# 2. train-step device trace at the shipped defaults (b16 bf16) — cold
#    compile budget per ADVICE
run 5400 python bench.py --mode train --batch 16 --dtype bf16 --iters 8 \
    --trace .profiles/train_r5

# 3. decode: per-op table (the copy-sea quantification)
if [ -d .profiles/train_r5 ]; then
  run 600 python tools/trace_decode.py .profiles/train_r5 --top 45
fi

# 4. PHASED_TAIL_TRAIN full-graph A/B (built+tested round 4, never
#    measured — measure or delete per the one-documented-negative rule)
run 5400 env T2IGAN_PHASED_TAIL_TRAIN=1 python bench.py --mode train \
    --batch 16 --dtype bf16 --iters 8 --trace .profiles/train_r5_pt

if [ -d .profiles/train_r5_pt ]; then
  run 600 python tools/trace_decode.py .profiles/train_r5_pt --top 20
fi

# 5. DAMSM step trace (b48 bf16) — first-ever per-op decode of this step
run 3600 python bench.py --mode damsm --batch 48 --dtype bf16 --iters 8 \
    --trace .profiles/damsm_r5

if [ -d .profiles/damsm_r5 ]; then
  run 600 python tools/trace_decode.py .profiles/damsm_r5 --top 30
fi

# 6. geneval defaults re-measure + driver-graph re-warm (cache was wiped
#    by the VM restart); shell timeout owns the budget
run 3600 env T2IGAN_BENCH_NO_SUPERVISE=1 python bench.py --mode geneval \
    --batch 128 --dtype bf16

echo "=== $(date -u +%H:%M:%S) QUEUE DONE" >> "$log"
