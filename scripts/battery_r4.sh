#!/bin/bash
# Round-4 chip battery (v2, trimmed to the round's wall clock):
#   1-3) plus-train crash reproduction + post-rework it/s (VERDICT r3 item 3)
#   4)   compiled gather ns/sample across offset distributions (items 2/6)
#   5)   plus compile-time anatomy, cache-cold then in-process hit (item 5)
# Sequential — one chip, one job at a time.  Evidence lands in
# results/*_r4.txt (tracked).  Each step is timeout-bounded so partial
# evidence survives the round boundary; run detached (setsid) so it
# survives the driver session.
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r4b.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "== battery_r4 v2 start $(stamp) ==" | tee -a "$out"

# --- 1) plus train bench, run 1 (cold compile; cache wiped by reprovision)
echo "-- bench_train yolact_plus_resnet50 b8 bf16 run1 $(stamp)" | tee -a "$out"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 2100 \
  python scripts/bench_train.py 8 20 bfloat16 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

# --- 2) plus train bench, run 2 (compile cache hot -> fast; 2nd clean run)
echo "-- bench_train yolact_plus_resnet50 b8 bf16 run2 $(stamp)" | tee -a "$out"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 480 \
  python scripts/bench_train.py 8 20 bfloat16 >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

# --- 3) the actual-train_step probe harness (code-path vs harness split)
echo "-- probe realstep b8 i20 bfloat16 $(stamp)" | tee -a "$out"
timeout 480 python scripts/probe_plus_train_crash.py realstep 8 20 bfloat16 \
  >>"$out" 2>&1
echo "exit=$? $(stamp)" | tee -a "$out"

# --- 4) gather microbench: compiled ns/sample for all variants
gout=results/gather_r4.txt
echo "== bench_gather2 8 30 $(stamp) ==" > "$gout"
timeout 900 python scripts/bench_gather2.py 8 30 >>"$gout" 2>&1
echo "exit=$? $(stamp)" | tee -a "$gout"

# --- 5) compile anatomy: where do plus compile minutes go?
#     (cache ON but this graph is cache-cold after the reprovision, so the
#      first call is the cold measurement and it populates the cache;
#      the script's in-process second compile measures the hit path)
aout=results/compile_anatomy_r4.txt
echo "== compile_anatomy yolact_plus_base b1 bf16 $(stamp) ==" > "$aout"
timeout 1800 python scripts/compile_anatomy.py yolact_plus_base 1 bfloat16 \
  >>"$aout" 2>&1
echo "exit=$? $(stamp)" | tee -a "$aout"

echo "== battery_r4 done $(stamp) ==" | tee -a "$out"
