#!/bin/bash
# Round-5 battery A: root-cause the plus-train worker crash (VERDICT #1).
# Hypothesis under test: the round-3 DCN block-gather's autodiff transpose
# (duplicate-index [2,2,C] block scatter-add) is pathologically slow on
# TPU, making the i20 chained train dispatch a multi-minute single
# execution that trips the relay/worker watchdog.
#
#   1) A/B: fwd vs vjp per-iter time, block-gather vs round-2 row-gather,
#      at each plus stage shape (the decisive measurement)
#   2) memory_analysis of the real plus train step (compile-only, no exec)
#   3) realstep iters sweep i1/i2/i4 (short dispatches — should PASS if
#      the crash is duration-driven; per-iter time of the REAL step)
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5a.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "== battery_r5a start $(stamp) ==" | tee -a "$out"

echo "-- probe ab b8 i10 float32 $(stamp)" | tee -a "$out"
timeout 3600 python scripts/probe_dcn_bwd.py ab 8 10 float32 >>"$out" 2>&1
rc=$?
echo "exit=$rc $(stamp)" | tee -a "$out"
[ "$rc" -ne 0 ] && sleep 180

echo "-- probe memanal b8 float32 $(stamp)" | tee -a "$out"
timeout 1800 python scripts/probe_dcn_bwd.py memanal 8 0 float32 >>"$out" 2>&1
rc=$?
echo "exit=$rc $(stamp)" | tee -a "$out"
[ "$rc" -ne 0 ] && sleep 180

echo "-- probe sweep b8 float32 $(stamp)" | tee -a "$out"
timeout 2400 python scripts/probe_dcn_bwd.py sweep 8 0 float32 >>"$out" 2>&1
rc=$?
echo "exit=$rc $(stamp)" | tee -a "$out"
[ "$rc" -ne 0 ] && sleep 180

echo "== battery_r5a done $(stamp) ==" | tee -a "$out"
