#!/bin/bash
# Chip queue, round-3 session 5: the tunnel is BACK after the >20h outage
# (VM restart wiped the old queue + /tmp logs + the compile cache), so this
# re-runs the parked agenda in strict value order on a cold cache:
#   1. geneval DEFAULT  — measures the bf16-Inception dtype fix (expected
#      biggest headline win) and warms the cache for the driver's bench.
#   2. UPBLOCK=bm (+pipe) — the batch-minor fused upconv kernel A/B (E5/E6).
#   3. MEMREAD=jnp       — eval-graph A/B.
#   4. LAYOUT_PIN=1      — row-major pin before the stage-3 upconv.
#   5. RGB mosaic probe + paired/glu A/Bs.
#   6. batch-256 probe, train + damsm step benches.
# Log: $CHIPQ_LOG (default /tmp/chipq_s5.log).
set -u
cd "$(dirname "$0")/.."
log=${CHIPQ_LOG:-/tmp/chipq_s5.log}
gv() { # gv <tag> [env k=v ...]
  local tag=$1; shift
  echo "=== geneval $tag $(date)" >> "$log"
  env "$@" T2IGAN_BENCH_NO_SUPERVISE=1 \
    timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
}
echo "=== chip queue S5 start $(date)" >> "$log"
gv DEFAULT
gv UPBLOCK=bm T2IGAN_UPBLOCK=bm
gv UPBLOCK=bm+PIPE T2IGAN_UPBLOCK=bm T2IGAN_BM_PIPE=1
gv MEMREAD=jnp T2IGAN_MEMREAD=jnp
gv LAYOUT_PIN=1 T2IGAN_LAYOUT_PIN=1
echo "=== rgb mosaic probe $(date)" >> "$log"
timeout 2400 python tools/probe_rgb_mosaic.py >> "$log" 2>&1
gv RGB=paired T2IGAN_RGB_KERNEL=paired
gv RGB=glu T2IGAN_RGB_KERNEL=glu
echo "=== geneval batch 256 $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 timeout 2700 python bench.py --mode geneval --batch 256 --iters 20 >> "$log" 2>&1
echo "=== bench train b16 bf16 $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 timeout 2700 python bench.py --mode train --batch 16 --iters 20 --dtype bf16 >> "$log" 2>&1
echo "=== bench damsm b48 bf16 $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 timeout 2700 python bench.py --mode damsm --batch 48 --iters 20 --dtype bf16 >> "$log" 2>&1
echo "=== queue S5 done $(date)" >> "$log"
