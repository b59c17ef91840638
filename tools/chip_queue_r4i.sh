#!/bin/bash
# Chip queue, round 4 part I — train-bench honesty probe.
#   0. Waits for the pid in $WAIT_PID (queue R4h) to exit.
#   1. train_timing_probe — block_until_ready fence vs a materializing
#      jax.device_get on the b16 bf16 adversarial step (cost_analysis says
#      6.02 TFLOP/step => >= 30.6 ms/step at 100% MFU; the committed wall
#      numbers imply 3.4 ms/step, which is physically impossible).
#   2. damsm honesty spot-check: same question for the DAMSM step is
#      answered by the probe's pattern + the damsm trace from R4h.
# Log: $CHIPQ_LOG (default /tmp/chipq_r4.log).
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
echo "=== chip queue R4i start $(date)" >> "$log"
run "train timing probe b16" timeout 2700 python tools/train_timing_probe.py
echo "=== queue R4i done $(date)" >> "$log"
