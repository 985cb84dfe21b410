#!/bin/bash
# Round-5 battery H: measure the hand-written DCN backward (corner
# blocks as residual + row scatters, no re-gather) vs the jax.vjp(rows)
# round-trip it replaces.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5h.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
wait_chip() {
  for i in $(seq 1 72); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 128))
assert float(x.sum()) == 8 * 128 * 128
" >/dev/null 2>&1; then
      echo "chip alive (probe $i) $(stamp)" | tee -a "$out"; return 0
    fi
    echo "chip dead (probe $i), sleeping 150s $(stamp)" | tee -a "$out"
    sleep 150
  done
  return 1
}
echo "== battery_r5h start $(stamp) ==" | tee -a "$out"

wait_chip || exit 1
echo "-- probe ab b8 i10 float32 (handwritten bwd) $(stamp)" | tee -a "$out"
timeout 3600 python scripts/probe_dcn_bwd.py ab 8 10 float32 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

for dt in bfloat16 float32; do
  wait_chip || exit 1
  echo "-- bench_train yolact_plus_resnet50 b8 i20 $dt (handwritten bwd) $(stamp)" | tee -a "$out"
  BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 1800 \
    python scripts/bench_train.py 8 20 $dt >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
done
echo "== battery_r5h done $(stamp) ==" | tee -a "$out"
