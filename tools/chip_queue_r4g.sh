#!/bin/bash
# Chip queue, round 4 part G — the fusion-friendly phased tail (v2).
#   0. Waits for the pid in $WAIT_PID (queue R4f) to exit.
#   1. geneval PHASED_TAIL=1 v2 — rank-4 phase chain, BN scale folded into
#      the conv kernel, GLU = flat channel split, mask = row/col broadcast
#      factors.  Comparators: v1 1458.5 / DEFAULT 1437.5.
#   2. gen-only PHASED_TAIL=1 v2 — comparators: v1 1744.0 / DEFAULT 1735.2.
#   3. geneval PHASED_TAIL=1 v2 + trace — decode to confirm the phase chain
#      fused (expect: one conv ~6.7 ms + at most one elementwise pass).
# Log: $CHIPQ_LOG (default /tmp/chipq_r4.log).  Each step appends "rc=N".
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
echo "=== chip queue R4g start $(date)" >> "$log"
run "geneval PHASED_TAIL=1 v2" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_TAIL=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20
run "gen-only PHASED_TAIL=1 v2" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_TAIL=1 \
  timeout 2700 python bench.py --mode gen --batch 128 --iters 20
run "geneval PHASED_TAIL=1 v2 + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_TAIL=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 \
  --trace .profiles/geneval_r4_phased_v2
echo "=== queue R4g done $(date)" >> "$log"
