#!/bin/bash
set -u
cd /root/repo
out=results/plus_train_r5n.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
for i in $(seq 1 36); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)) @ jnp.ones((128,128)); assert float(x.sum())
" >/dev/null 2>&1; then echo "chip alive $(stamp)" | tee -a "$out"; break; fi
  echo "chip dead (probe $i) $(stamp)" | tee -a "$out"; sleep 150
done
echo "-- probe ab b8 i10 f32 (post gather_impl refactor smoke) $(stamp)" | tee -a "$out"
timeout 3600 python scripts/probe_dcn_bwd.py ab 8 10 float32 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"
