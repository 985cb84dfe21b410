#!/bin/bash
set -u
cd /root/repo
out=results/horizon_map_r5.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
for i in $(seq 1 36); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)) @ jnp.ones((128,128)); assert float(x.sum())
" >/dev/null 2>&1; then echo "chip alive $(stamp)" | tee -a "$out"; break; fi
  echo "chip dead (probe $i) $(stamp)" | tee -a "$out"; sleep 150
done
echo "-- horizon eval: plus ckpt @1200 -> full dataset mAP $(stamp)" | tee -a "$out"
timeout 3600 python scripts/train_horizon.py yolact_plus_resnet50 \
  --eval weights/yolact_plus_resnet50_horizon_149_1200.ckpt >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"
