#!/bin/bash
# Chip queue: poll for the axon tunnel, then run the queued on-chip A/Bs.
#
# The axon relay to the one real v5e chip goes down for hours at a time
# (see BASELINE.md round-3 rows); this script parks the measurement agenda
# so the chip time is used the moment the tunnel returns.  Log: $CHIPQ_LOG.
#
# Queue (round 3): RGB-head Mosaic probe -> geneval A/B of the default /
# paired / glu RGB kernels -> inception section microbench -> CLIP flash
# attention A/B -> memory-read jnp-vs-fused eval-graph A/B.
set -u
cd "$(dirname "$0")/.."
log=${CHIPQ_LOG:-/tmp/chipq.log}
echo "=== chip queue start $(date)" >> "$log"
up=0
for i in $(seq 1 "${CHIPQ_ATTEMPTS:-200}"); do
  if timeout 150 python -c "import jax; print(jax.devices())" >> "$log" 2>&1; then
    echo "tunnel up after attempt $i $(date)" >> "$log"
    up=1
    break
  fi
  echo "tunnel down, attempt $i $(date)" >> "$log"
  sleep 90
done
if [ "$up" != "1" ]; then
  echo "=== queue GAVE UP (tunnel never came back) $(date)" >> "$log"
  exit 1
fi
echo "=== 1. rgb mosaic probe (paired + glu) $(date)" >> "$log"
timeout 2400 python tools/probe_rgb_mosaic.py >> "$log" 2>&1
echo "=== 2. bench geneval DEFAULT (A side, warms the BENCH cache) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== 3. bench geneval PAIRED RGB $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_RGB_KERNEL=paired timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== 4. bench geneval GLU RGB $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_RGB_KERNEL=glu timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== 5. inception microbench $(date)" >> "$log"
timeout 3600 python tools/microbench_inception.py --batch 128 --iters 20 >> "$log" 2>&1
echo "=== 6. flash attention A/B (DAMSM step) $(date)" >> "$log"
timeout 3600 python tools/flash_attn_ab.py >> "$log" 2>&1
echo "=== 7. bench geneval MEMREAD=jnp A/B $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 T2IGAN_MEMREAD=jnp timeout 2700 python bench.py --mode geneval --batch 128 --iters 20 >> "$log" 2>&1
echo "=== 8. bench damsm (fused-qkv CLIP step; prev 197.8 steps/s b48 bf16) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 timeout 2700 python bench.py --mode damsm --batch 48 --iters 20 --dtype bf16 >> "$log" 2>&1
echo "=== 9. bench train (adversarial step; prev 288.9 steps/s b16 bf16) $(date)" >> "$log"
T2IGAN_BENCH_NO_SUPERVISE=1 timeout 2700 python bench.py --mode train --batch 16 --iters 20 --dtype bf16 >> "$log" 2>&1
echo "=== queue done $(date)" >> "$log"
