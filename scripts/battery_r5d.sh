#!/bin/bash
# Round-5 battery D: outage-aware serialized runner for all remaining
# chip legs.  The rig's axon relay goes unreachable for stretches (round
# 2: hours; this morning: 09:47-? — the f32 remat sweep leg hung at
# first contact and timed out at 40 min with 16 s of CPU used).  Every
# leg is preceded by a bounded liveness probe; while the chip is dead we
# sleep instead of burning a leg timeout.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5d.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

wait_chip() {
  # probe until a trivial device op completes; max ~6h
  for i in $(seq 1 72); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 128))
assert float(x.sum()) == 8 * 128 * 128
" >/dev/null 2>&1; then
      echo "chip alive (probe $i) $(stamp)" | tee -a "$out"
      return 0
    fi
    echo "chip dead (probe $i), sleeping 300s $(stamp)" | tee -a "$out"
    sleep 300
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
  [ "$rc" -ne 0 ] && sleep 120
  return 0
}

echo "== battery_r5d start $(stamp) ==" | tee -a "$out"

# 1) the interrupted r5b legs
leg 1800 "$out" "probe memanal b8 bfloat16 (remat=dcn)" \
  python scripts/probe_dcn_bwd.py memanal 8 0 bfloat16
leg 2400 "$out" "probe sweep b8 bfloat16 (remat=dcn)" \
  python scripts/probe_dcn_bwd.py sweep 8 0 bfloat16
leg 2400 "$out" "probe sweep b8 float32 (remat=dcn) retry" \
  python scripts/probe_dcn_bwd.py sweep 8 0 float32

# 2) bench_train records (VERDICT #1 done criterion: >=2 clean runs each)
for dt in bfloat16 float32; do
  for run in 1 2; do
    BENCH_TRAIN_CONFIG=yolact_plus_resnet50 \
      leg 1800 "$out" "bench_train yolact_plus_resnet50 b8 i20 $dt run$run" \
      env BENCH_TRAIN_CONFIG=yolact_plus_resnet50 \
      python scripts/bench_train.py 8 20 $dt
  done
done

# 3) remat policy A/B
leg 2400 "$out" "probe sweep b8 float32 PROBE_REMAT=all" \
  env PROBE_REMAT=all python scripts/probe_dcn_bwd.py sweep 8 0 float32

# 4) gather reconciliation (VERDICT #3)
gout=results/gather_r5.txt
echo "== bench_gather2 8 30 $(stamp) ==" > "$gout"
leg 1800 "$gout" "bench_gather2 8 30" python scripts/bench_gather2.py 8 30

# 5) plus inference re-measure (VERDICT #4)
iout=results/plus_infer_r5.txt
: > "$iout"
for cfgname in yolact_plus_base yolact_plus_resnet50; do
  for b in 1 8; do
    leg 1500 "$iout" "bench.py $cfgname b$b bf16" \
      env BENCH_CONFIG=$cfgname python bench.py $b 30 bfloat16
  done
done

echo "== battery_r5d done $(stamp) ==" | tee -a "$out"
