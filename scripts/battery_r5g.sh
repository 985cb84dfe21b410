#!/bin/bash
# Round-5 battery G: profile the FIXED plus train step (remat + custom
# VJP) and summarize where the remaining ~0.34 s/iter goes.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5g.txt
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

echo "== battery_r5g start $(stamp) ==" | tee -a "$out"
wait_chip || { echo "GIVING UP $(stamp)" | tee -a "$out"; exit 1; }

echo "-- probe profile b8 bfloat16 $(stamp)" | tee -a "$out"
PROBE_PROFILE_DIR=/tmp/prof_plus_train_r5 timeout 2400 \
  python scripts/probe_dcn_bwd.py profile 8 0 bfloat16 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

for pb in /tmp/prof_plus_train_r5/plugins/profile/*/*.xplane.pb; do
  [ -e "$pb" ] || continue
  echo "-- parse_xplane $pb $(stamp)" | tee -a "$out"
  timeout 600 python scripts/parse_xplane.py "$pb" 30 >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
done

echo "== battery_r5g done $(stamp) ==" | tee -a "$out"
