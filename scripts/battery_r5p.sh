#!/bin/bash
set -u
cd /root/repo
out=results/horizon_r5_seg2.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
for i in $(seq 1 36); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)) @ jnp.ones((128,128)); assert float(x.sum())
" >/dev/null 2>&1; then echo "chip alive $(stamp)" | tee -a "$out"; break; fi
  echo "chip dead (probe $i) $(stamp)" | tee -a "$out"; sleep 150
done
echo "-- horizon segment 2: resume latest -> 2400 iters $(stamp)" | tee -a "$out"
timeout 7200 python scripts/train_horizon.py yolact_plus_resnet50 \
  --iters 2400 --resume latest >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"
echo "-- eval ckpt @2400 $(stamp)" | tee -a "$out"
ck=$(ls -t weights/yolact_plus_resnet50_horizon_*_2400.ckpt 2>/dev/null | head -1)
if [ -n "$ck" ]; then
  timeout 3600 python scripts/train_horizon.py yolact_plus_resnet50 \
    --eval "$ck" >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
else
  echo "NO 2400 CKPT FOUND $(stamp)" | tee -a "$out"
fi
echo "== done $(stamp) ==" | tee -a "$out"
