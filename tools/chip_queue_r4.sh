#!/bin/bash
# Chip queue, round 4: the remainder of the S5 agenda (S5 ran only
# DEFAULT/bm/bm+PIPE before the round boundary killed it — those three are
# committed in docs/PERFORMANCE.md "Round 4: chip-queue S5 harvest").
# Strict value order:
#   1. MEMREAD=jnp        — eval-graph A/B (the run the boundary killed).
#   2. LAYOUT_PIN=1       — row-major pin before the stage-3 upconv.
#   3. RGB mosaic probe + paired/glu A/Bs.
#   4. geneval batch-256 probe.
#   5. train b16 bf16     — measures the one-G-forward fold (expect >337.9).
#   6. damsm b48 bf16     — re-measure on the qkv-fused towers.
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
echo "=== chip queue R4 start $(date)" >> "$log"
gv MEMREAD=jnp T2IGAN_MEMREAD=jnp
gv LAYOUT_PIN=1 T2IGAN_LAYOUT_PIN=1
run "rgb mosaic probe" timeout 2400 python tools/probe_rgb_mosaic.py
gv RGB=paired T2IGAN_RGB_KERNEL=paired
gv RGB=glu T2IGAN_RGB_KERNEL=glu
run "geneval batch 256" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 256 --iters 20
run "train b16 bf16" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode train --batch 16 --iters 20 --dtype bf16
run "damsm b48 bf16" env T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode damsm --batch 48 --iters 20 --dtype bf16
echo "=== queue R4 done $(date)" >> "$log"
