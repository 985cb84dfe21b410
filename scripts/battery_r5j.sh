#!/bin/bash
# (ad-hoc round-5 leg, copied into the repo for provenance: 1200-iter plus horizon -> results/horizon_r5_long.txt)
set -u
cd /root/repo
out=results/horizon_r5_long.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
for i in $(seq 1 72); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)) @ jnp.ones((128,128)); assert float(x.sum())
" >/dev/null 2>&1; then echo "chip alive $(stamp)" | tee -a "$out"; break; fi
  echo "chip dead (probe $i) $(stamp)" | tee -a "$out"; sleep 150
done
echo "-- train_horizon yolact_plus_resnet50 1200 iters $(stamp)" | tee -a "$out"
timeout 10800 python scripts/train_horizon.py yolact_plus_resnet50 --iters 1200 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"
echo "== done $(stamp) ==" | tee -a "$out"
