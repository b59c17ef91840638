#!/bin/bash
# Chip queue, round 4 part D.  Waits for chip_queue_r4c.sh (it owns the
# chip), then in strict value order:
#   1-3. train b16 bf16 anomaly investigation: the r4c measurement (175.1
#        steps/sec, iters 20) is HALF the round-1 commit (288.9) despite
#        the -22%-FLOP fold.  Re-measure with iters 200 (a 3 ms step over
#        20 iters is timer-noise territory), then the round-1 comparators
#        (b4 bf16; b16 f32) to separate code regression from host/tunnel
#        dispatch latency.
#   4.   damsm b48 bf16 iters 200 — same anomaly signature (138.9 vs 197.8).
#   5.   gen-only b128 — round-2 comparator (1724.7) for the amortized path.
#   6.   flash-attn A/B (T2IGAN_FLASH_ATTN) — the LAST unmeasured
#        graph-selecting env flag; promote or delete on this verdict.
# Log: $CHIPQ_LOG (default /tmp/chipq_r4.log).  Each step appends "rc=N".
set -u
cd "$(dirname "$0")/.." || exit 1
log=${CHIPQ_LOG:-/tmp/chipq_r4.log}
echo "=== chip queue R4d waiting for R4c $(date)" >> "$log.d"
while ! grep -q "queue R4c done" "$log" 2>/dev/null; do sleep 60; done
run() { # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag $(date)" >> "$log"
  "$@" >> "$log" 2>&1
  echo "rc=$? [$tag]" >> "$log"
}
echo "=== chip queue R4d start $(date)" >> "$log"
run "train b16 bf16 iters200" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 200 --dtype bf16
run "train b4 bf16 iters200" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 4 --iters 200 --dtype bf16
run "train b16 f32 iters100" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 100 --dtype f32
run "damsm b48 bf16 iters200" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 200 --dtype bf16
run "gen-only b128" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode gen --batch 128 --iters 20
run "flash-attn A/B" timeout 2400 python tools/flash_attn_ab.py
echo "=== queue R4d done $(date)" >> "$log"
