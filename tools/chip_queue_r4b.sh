#!/bin/bash
# Chip queue, round 4 part B: evidence for the Inception-eval attack.
# Waits for chip_queue_r4.sh to finish (it owns the chip), then:
#   1. geneval DEFAULT with a fresh jax.profiler trace (bf16 Inception now
#      dtype-threaded — the round-2 trace is stale) -> .profiles/geneval_r4
#   2. Inception section microbench (preprocess/stem/3b4a/A-C/D-E split).
# Log: $CHIPQ_LOG (default /tmp/chipq_r4b.log).
set -u
cd "$(dirname "$0")/.." || exit 1
log=${CHIPQ_LOG:-/tmp/chipq_r4b.log}
main_log=${CHIPQ_MAIN_LOG:-/tmp/chipq_r4.log}
echo "=== chip queue R4b start $(date)" >> "$log"
while ! grep -q "queue R4 done" "$main_log" 2>/dev/null; do sleep 60; done
run() {
  local tag=$1; shift
  echo "=== $tag $(date)" >> "$log"
  "$@" >> "$log" 2>&1
  echo "rc=$? [$tag]" >> "$log"
}
run "geneval default + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 \
  --trace .profiles/geneval_r4
run "inception sections b128" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python tools/microbench_inception.py --batch 128 --iters 20
echo "=== queue R4b done $(date)" >> "$log"
