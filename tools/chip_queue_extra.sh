#!/bin/bash
# Chip queue, part 2: waits for tools/chip_queue.sh to finish (its log gains
# "queue done"), then runs the second-priority probes.  Kept as a separate
# file because editing a bash script that is mid-execution corrupts it.
#
# Items: flag combos (memread=jnp x RGB-kernel variants — the layout
# interactions are only measurable at the full-graph level, see
# docs/PERFORMANCE.md "layout economics") and a batch-256 geneval probe
# (throughput/img may improve with a larger batch amortizing the text
# encode + inception stem).
set -u
cd "$(dirname "$0")/.."
prev=${CHIPQ_LOG:-/tmp/chipq5.log}
log=${CHIPQ2_LOG:-/tmp/chipq5b.log}
echo "=== chip queue EXTRA start $(date)" >> "$log"
for i in $(seq 1 "${CHIPQ2_ATTEMPTS:-600}"); do
  if grep -q "queue done" "$prev" 2>/dev/null; then
    echo "primary queue finished after poll $i $(date)" >> "$log"
    break
  fi
  sleep 60
done
if ! grep -q "queue done" "$prev" 2>/dev/null; then
  echo "=== EXTRA gave up waiting for the primary queue $(date)" >> "$log"
  exit 1
fi
echo "=== E1. geneval MEMREAD=jnp + RGB=paired $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_MEMREAD=jnp T2IGAN_RGB_KERNEL=paired \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== E2. geneval MEMREAD=jnp + RGB=glu $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_MEMREAD=jnp T2IGAN_RGB_KERNEL=glu \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== E3. geneval batch 256 (default flags) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 \
  timeout 2700 python bench.py --mode geneval --batch 256 --iters 20 >> "$log" 2>&1
echo "=== E4. geneval LAYOUT_PIN=1 (row-major pin before the stage-3 upconv) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_LAYOUT_PIN=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== E5. geneval UPBLOCK=bm (batch-minor fused upconv kernel) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_UPBLOCK=bm \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== E6. geneval UPBLOCK=bm + BM_PIPE=1 (pipelined DMA schedule) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_UPBLOCK=bm T2IGAN_BM_PIPE=1 \
  timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== queue EXTRA done $(date)" >> "$log"
