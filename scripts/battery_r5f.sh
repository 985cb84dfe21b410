#!/bin/bash
# Round-5 battery F: re-measure the single-layer DCN A/B with the FIXED
# probe (grads genuinely consumed — the first r5a run dead-code-
# eliminated the backward, see NOTES.md round-5 caveat).  Gives the true
# per-layer backward cost of the block-gather vs row-gather transposes.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5f.txt
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

echo "== battery_r5f start $(stamp) ==" | tee -a "$out"

# one more clean bf16 bench_train (run1 of battery d2 predates the
# custom-VJP backward; VERDICT wants >=2 clean runs per dtype)
wait_chip || { echo "GIVING UP $(stamp)" | tee -a "$out"; exit 1; }
echo "-- bench_train yolact_plus_resnet50 b8 i20 bfloat16 run3 $(stamp)" \
  | tee -a "$out"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 1800 \
  python scripts/bench_train.py 8 20 bfloat16 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

# per-layer A/B with the FIXED probe (grads genuinely consumed): the
# true backward cost of block vs row transposes, the measurement that
# justifies the custom VJP
wait_chip || { echo "GIVING UP $(stamp)" | tee -a "$out"; exit 1; }
echo "-- probe ab b8 i10 float32 (fixed vjp) $(stamp)" | tee -a "$out"
timeout 3600 python scripts/probe_dcn_bwd.py ab 8 10 float32 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

echo "== battery_r5f done $(stamp) ==" | tee -a "$out"
