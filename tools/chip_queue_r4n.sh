#!/bin/bash
# Round-4 session-4 chip queue: train-step trace re-capture (the compile
# cache was wiped by a VM restart, so item 1 pays a cold multi-minute
# compile) and the decode that quantifies the next train lever (the tiny
# f32[128] copy sea flagged in NOTES session 2).  Run from anywhere:
#   bash tools/chip_queue_r4n.sh [logfile]
# Every item appends rc=N so a dead run is detectable (ADVICE round 3).
set -u
cd "$(dirname "$0")/.." || exit 1
log="${1:-/tmp/chipq_r4n.log}"

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> "$log"
  timeout 1800 "$@" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
}

# 1. train-step device trace at the shipped defaults (b16 bf16)
run python bench.py --mode train --batch 16 --dtype bf16 --iters 8 \
    --trace .profiles/train_r4n

# 2. decode: per-op table (the copy-sea quantification)
run python tools/trace_decode.py .profiles/train_r4n --top 40

# 3. geneval defaults re-measure (confirms the shipped 1642.85 headline
#    reproduces after the cache wipe; also re-warms the driver's graph)
run python bench.py --mode geneval --batch 128 --dtype bf16
