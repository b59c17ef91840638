#!/bin/bash
# Chip queue, round 4 part C: restart of the tail of chip_queue_r4.sh
# (the session boundary killed the queue mid-RGB=glu at 10:03; MEMREAD,
# LAYOUT_PIN, the mosaic probe, and RGB=paired completed and are committed
# in docs/PERFORMANCE.md).  Remaining strict value order:
#   1. RGB=glu            — the interrupted A/B.
#   2. geneval batch-256  — probe whether a bigger eval batch lifts MFU.
#   3. train b16 bf16     — measures the one-G-forward fold (expect >337.9).
#   4. damsm b48 bf16     — re-measure on the qkv-fused towers.
# Then the r4b evidence items for the Inception-eval attack:
#   5. geneval DEFAULT with a fresh jax.profiler trace -> .profiles/geneval_r4
#   6. Inception section microbench.
# Log: $CHIPQ_LOG (default /tmp/chipq_r4.log).  Each step appends "rc=N".
set -u
cd "$(dirname "$0")/.." || exit 1
log=${CHIPQ_LOG:-/tmp/chipq_r4.log}
run() { # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag $(date)" >> "$log"
  "$@" >> "$log" 2>&1
  echo "rc=$? [$tag]" >> "$log"
}
gv() { # gv <tag> [k=v ...]
  local tag=$1; shift
  run "geneval $tag" env "$@" T2IGAN_BENCH_NO_SUPERVISE=1 \
    timeout 2700 python bench.py --mode geneval --batch 128 --iters 20
}
echo "=== chip queue R4c start $(date)" >> "$log"
gv RGB=glu T2IGAN_RGB_KERNEL=glu
run "geneval batch 256" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 256 --iters 20
run "train b16 bf16" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 --dtype bf16
run "damsm b48 bf16" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 20 --dtype bf16
run "geneval default + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 \
  --trace .profiles/geneval_r4
run "inception sections b128" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python tools/microbench_inception.py --batch 128 --iters 20
echo "=== queue R4c done $(date)" >> "$log"
