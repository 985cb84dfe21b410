#!/bin/bash
# Round-5 battery D2: continuation of battery_r5d (its bf16 memanal leg
# completed: remat bf16 temp = 3.559 GiB) with a faster liveness cadence
# — the relay is flapping in short availability windows (alive 11:56,
# dead again 12:12), so probe every ~2.5 min instead of 5.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5d.txt   # append to the same evidence file
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

wait_chip() {
  for i in $(seq 1 144); do
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

leg() {  # leg <timeout> <logfile> <desc> <cmd...>
  local to="$1" log="$2" desc="$3"; shift 3
  wait_chip || { echo "GIVING UP: chip never returned $(stamp)" \
                   | tee -a "$out"; exit 1; }
  echo "-- $desc $(stamp)" | tee -a "$log"
  timeout "$to" "$@" >>"$log" 2>&1
  local rc=$?
  echo "exit=$rc $(stamp)" | tee -a "$log"
  [ "$rc" -ne 0 ] && sleep 60
  return 0
}

echo "== battery_r5d2 start $(stamp) ==" | tee -a "$out"

leg 2400 "$out" "probe sweep b8 bfloat16 (remat=dcn)" \
  python scripts/probe_dcn_bwd.py sweep 8 0 bfloat16
leg 2400 "$out" "probe sweep b8 float32 (remat=dcn) retry" \
  python scripts/probe_dcn_bwd.py sweep 8 0 float32

for dt in bfloat16 float32; do
  for run in 1 2; do
    leg 1800 "$out" "bench_train yolact_plus_resnet50 b8 i20 $dt run$run" \
      env BENCH_TRAIN_CONFIG=yolact_plus_resnet50 \
      python scripts/bench_train.py 8 20 $dt
  done
done

leg 2400 "$out" "probe sweep b8 float32 PROBE_REMAT=all" \
  env PROBE_REMAT=all python scripts/probe_dcn_bwd.py sweep 8 0 float32

gout=results/gather_r5.txt
echo "== bench_gather2 8 30 $(stamp) ==" >> "$gout"
leg 1800 "$gout" "bench_gather2 8 30" python scripts/bench_gather2.py 8 30

iout=results/plus_infer_r5.txt
for cfgname in yolact_plus_base yolact_plus_resnet50; do
  for b in 1 8; do
    leg 1500 "$iout" "bench.py $cfgname b$b bf16" \
      env BENCH_CONFIG=$cfgname python bench.py $b 30 bfloat16
  done
done

echo "== battery_r5d2 done $(stamp) ==" | tee -a "$out"
