#!/bin/bash
# Chip queue, round 4 part F — DAMSM anomaly diagnosis + fixed flash A/B.
#   0. Waits for the pid in $WAIT_PID (the phased-tail trace run) to exit.
#   1. damsm b48 bf16 iters200 + device trace — decode ms/step on-device
#      vs the wall clock: separates host/dispatch latency (this round's
#      1-CPU host) from a device-side regression (round-3 fused qkv).
#      Comparators: 197.8 steps/sec (round 1), 128.45 (R4d iters200).
#   2. flash-attn A/B (clip.py platform_dependent dtype fix) — numerics +
#      isolated step timing.
#   3. damsm FLASH_ATTN=1 b48 iters200 via bench.py.
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
echo "=== chip queue R4f start $(date)" >> "$log"
run "damsm b48 bf16 iters200 + trace" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 200 \
  --dtype bf16 --trace .profiles/damsm_r4
run "flash-attn A/B (fixed)" timeout 2400 python tools/flash_attn_ab.py
run "damsm FLASH_ATTN=1 b48 iters200" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_FLASH_ATTN=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 200 --dtype bf16
echo "=== queue R4f done $(date)" >> "$log"
