#!/bin/bash
# Chip queue, round 4 part H — step traces for the two open questions.
#   0. Waits for the pid in $WAIT_PID (queue R4g) to exit.
#   1. damsm b48 bf16 + trace — the anomaly diagnosis (105.8-128.5 vs
#      round-1 197.8 steps/sec): device ms/step from the trace separates
#      host/dispatch latency from a device-side regression.
#   2. train b16 bf16 + trace — per-op map of the adversarial step: where
#      do its 3.36 ms go (decides whether a train-side phased tail or
#      other step work is worth building).
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
echo "=== chip queue R4h start $(date)" >> "$log"
run "damsm b48 bf16 iters200 + trace v2" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 200 \
  --dtype bf16 --trace .profiles/damsm_r4
run "train b16 bf16 iters200 + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 200 \
  --dtype bf16 --trace .profiles/train_r4
echo "=== queue R4h done $(date)" >> "$log"
