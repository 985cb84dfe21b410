#!/bin/bash
# Round-5 battery E: short real YOLACT++ training on-chip (VERDICT #5).
# Runs after battery_r5d confirms the fixed plus train step.  Uses the
# existing train_horizon harness (learnable synthetic shapes dataset,
# production CLI trainer, single-step dispatches — watchdog-safe).
set -u
cd "$(dirname "$0")/.."
out=results/horizon_r5.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

wait_chip() {
  for i in $(seq 1 72); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 128))
assert float(x.sum()) == 8 * 128 * 128
" >/dev/null 2>&1; then
      echo "chip alive (probe $i) $(stamp)" | tee -a "$out"; return 0
    fi
    echo "chip dead (probe $i), sleeping 300s $(stamp)" | tee -a "$out"
    sleep 300
  done
  return 1
}

echo "== battery_r5e start $(stamp) ==" | tee -a "$out"
wait_chip || { echo "GIVING UP $(stamp)" | tee -a "$out"; exit 1; }

echo "-- train_horizon yolact_plus_resnet50 500 iters $(stamp)" | tee -a "$out"
timeout 5400 python scripts/train_horizon.py yolact_plus_resnet50 \
  --iters 500 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

echo "== battery_r5e done $(stamp) ==" | tee -a "$out"
