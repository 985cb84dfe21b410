#!/bin/bash
set -u
cd /root/repo
out=results/gather_r5b.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
for i in $(seq 1 36); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)) @ jnp.ones((128,128)); assert float(x.sum())
" >/dev/null 2>&1; then echo "chip alive $(stamp)" | tee -a "$out"; break; fi
  echo "chip dead (probe $i) $(stamp)" | tee -a "$out"; sleep 150
done
echo "-- bench_gather2 8 30 rerun (is block/zero=63ns real or first-leg warmup?) $(stamp)" | tee -a "$out"
timeout 1800 python scripts/bench_gather2.py 8 30 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"
