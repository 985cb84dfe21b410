#!/bin/bash
# (ad-hoc round-5 leg, copied into the repo for provenance: memanal with the hand-written backward -> results/plus_train_r5i.txt)
set -u
cd /root/repo
out=results/plus_train_r5i.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
for i in $(seq 1 72); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)) @ jnp.ones((128,128)); assert float(x.sum())
" >/dev/null 2>&1; then echo "chip alive $(stamp)" | tee -a "$out"; break; fi
  echo "chip dead (probe $i) $(stamp)" | tee -a "$out"; sleep 150
done
for dt in float32 bfloat16; do
  echo "-- memanal b8 $dt (handwritten bwd) $(stamp)" | tee -a "$out"
  timeout 1800 python scripts/probe_dcn_bwd.py memanal 8 0 $dt >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
done
echo "== done $(stamp) ==" | tee -a "$out"
