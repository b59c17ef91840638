#!/bin/bash
# Chip queue, round 4 part E.  In value order:
#   1. geneval PHASED_TAIL=1 — the decisive A/B for the phase-space eval
#      tail (ops/image.py::up2x_bn_glu_rgb_phased).  Comparator: the same
#      session's DEFAULT 1433.4 (trace run) / 1437.5 (S5).  The round-4
#      trace shows the dilated stage-3 upconv at 21.0 ms/batch == dense-4x4
#      MXU cost; the phased form does the same arithmetic at 1/4 FLOPs.
#   2. gen-only PHASED_TAIL=1 — comparator 1735.2 (R4d).
#   3. flash-attn A/B (numerics + step timing; init-path fix: clip.py now
#      routes the flash branch through platform_dependent).
#   4. damsm FLASH_ATTN=1 via bench.py — comparator 128.45 (R4d iters200).
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
echo "=== chip queue R4e start $(date)" >> "$log"
run "geneval PHASED_TAIL=1" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_TAIL=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20
run "gen-only PHASED_TAIL=1" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_PHASED_TAIL=1 \
  timeout 2700 python bench.py --mode gen --batch 128 --iters 20
run "flash-attn A/B" timeout 2400 python tools/flash_attn_ab.py
run "damsm FLASH_ATTN=1 b48 iters200" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  T2IGAN_FLASH_ATTN=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 200 --dtype bf16
echo "=== queue R4e done $(date)" >> "$log"
