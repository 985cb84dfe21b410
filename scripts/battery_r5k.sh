#!/bin/bash
# Round-5 battery K: post-fix scaling probes — larger plus train batch
# (bf16 temp is 3.6 GiB at b8, so b16 fits comfortably), the s2d stem
# at plus-train, and plus steady-state pipelined inference.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5k.txt
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
echo "== battery_r5k start $(stamp) ==" | tee -a "$out"

wait_chip || exit 1
echo "-- bench_train plus b16 i20 bf16 $(stamp)" | tee -a "$out"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 2400 \
  python scripts/bench_train.py 16 20 bfloat16 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

wait_chip || exit 1
echo "-- bench_train plus b8 i20 bf16 s2d $(stamp)" | tee -a "$out"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 2400 \
  python scripts/bench_train.py 8 20 bfloat16 s2d >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

for cfgname in yolact_plus_base; do
  for b in 1 8; do
    wait_chip || exit 1
    echo "-- BENCH_STREAMS=2 bench.py $cfgname b$b bf16 $(stamp)" | tee -a "$out"
    BENCH_STREAMS=2 BENCH_CONFIG=$cfgname timeout 1500 \
      python bench.py $b 30 bfloat16 >>"$out" 2>&1
    echo "exit=$? $(stamp)" | tee -a "$out"
  done
done
echo "== battery_r5k done $(stamp) ==" | tee -a "$out"
