#!/bin/bash
# Round-5 battery C: record the fixed plus-train it/s (VERDICT #1 done
# criterion: >=2 clean bench_train runs in bf16 AND f32), A/B the remat
# policy, and re-measure plus inference b1/b8 post-cleanup (VERDICT #4).
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5c.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "== battery_r5c start $(stamp) ==" | tee -a "$out"

for dt in bfloat16 float32; do
  for run in 1 2; do
    echo "-- bench_train yolact_plus_resnet50 b8 i20 $dt run$run $(stamp)" \
      | tee -a "$out"
    BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 1800 \
      python scripts/bench_train.py 8 20 $dt >>"$out" 2>&1
    rc=$?
    echo "exit=$rc $(stamp)" | tee -a "$out"
    [ "$rc" -ne 0 ] && sleep 180
  done
done

echo "-- probe sweep b8 float32 PROBE_REMAT=all $(stamp)" | tee -a "$out"
PROBE_REMAT=all timeout 2400 python scripts/probe_dcn_bwd.py sweep 8 0 float32 \
  >>"$out" 2>&1
rc=$?
echo "exit=$rc $(stamp)" | tee -a "$out"
[ "$rc" -ne 0 ] && sleep 180

iout=results/plus_infer_r5.txt
: > "$iout"
for cfgname in yolact_plus_base yolact_plus_resnet50; do
  for b in 1 8; do
    echo "-- bench.py $cfgname b$b bf16 $(stamp)" | tee -a "$iout"
    BENCH_CONFIG=$cfgname timeout 1500 python bench.py $b 30 bfloat16 \
      >>"$iout" 2>&1
    rc=$?
    echo "exit=$rc $(stamp)" | tee -a "$iout"
    [ "$rc" -ne 0 ] && sleep 180
  done
done

echo "== battery_r5c done $(stamp) ==" | tee -a "$out"
