#!/bin/bash
# Round-4 follow-up battery: bisect the deterministic bf16 plus-train
# worker crash (bench_train bf16 b8 crashed 2/2 on first execution with
# a hot compile cache — results/plus_train_r4b.txt) and collect the
# remaining round-4 evidence.
#
#   1) minimal bf16 DCN grad at real stage shapes  (is DCN-bf16 the trigger?)
#   2) bench_train float32                         (dtype bisect at full scale
#                                                   + post-rework plus it/s)
#   3) gather microbench                           (VERDICT items 2/6)
#   4) if (1) passed: train-step replica bf16 with maskiou OFF
#      (distinguishes maskiou-bf16 from DCN-bf16)
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r4c.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "== battery_r4c start $(stamp) ==" | tee -a "$out"

echo "-- probe dcn b8 i10 bfloat16 $(stamp)" | tee -a "$out"
timeout 600 python scripts/probe_plus_train_crash.py dcn 8 10 bfloat16 \
  >>"$out" 2>&1
dcn_exit=$?
echo "exit=$dcn_exit $(stamp)" | tee -a "$out"

echo "-- bench_train yolact_plus_resnet50 b8 float32 $(stamp)" | tee -a "$out"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 1800 \
  python scripts/bench_train.py 8 20 float32 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

gout=results/gather_r4c_gather.txt  # battery-specific: never clobber battery_r4.sh evidence
echo "== bench_gather2 8 30 $(stamp) ==" > "$gout"
timeout 900 python scripts/bench_gather2.py 8 30 >>"$gout" 2>&1
echo "exit=$? $(stamp)" | tee -a "$gout"

if [ "$dcn_exit" -eq 0 ]; then
  echo "-- probe lossnm (maskiou OFF) b8 i3 bfloat16 $(stamp)" | tee -a "$out"
  timeout 1500 python scripts/probe_plus_train_crash.py lossnm 8 3 bfloat16 \
    >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
else
  echo "-- dcn-bf16 crashed: minimal trigger found, lossnm skipped" \
    | tee -a "$out"
  echo "-- probe dcn b8 i10 float32 (control) $(stamp)" | tee -a "$out"
  timeout 600 python scripts/probe_plus_train_crash.py dcn 8 10 float32 \
    >>"$out" 2>&1
  echo "exit=$? $(stamp)" | tee -a "$out"
fi

echo "== battery_r4c done $(stamp) ==" | tee -a "$out"
