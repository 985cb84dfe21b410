#!/bin/bash
# Round-5 battery M: freshness re-measurement of the yolact_base rows on
# the final round-5 tree (code paths unchanged this round; confirms no
# regression from the DCN/train work).
set -u
cd "$(dirname "$0")/.."
out=results/base_r5.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
wait_chip() {
  for i in $(seq 1 36); do
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
echo "== battery_r5m start $(stamp) ==" | tee -a "$out"
for b in 1 8; do
  wait_chip || exit 1
  echo "-- bench.py yolact_base b$b bf16 $(stamp)" | tee -a "$out"
  timeout 1500 python bench.py $b 30 bfloat16 >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
done
wait_chip || exit 1
echo "-- bench_train yolact_base b8 i20 bf16 $(stamp)" | tee -a "$out"
timeout 1800 python scripts/bench_train.py 8 20 bfloat16 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"
echo "== battery_r5m done $(stamp) ==" | tee -a "$out"
