#!/bin/bash
# Round-5 battery B: measure the remat fix (cfg.train_remat='dcn', new
# default) against battery A's findings: plus train step RUNS but at
# 10.1 s/iter with 14.38 GiB temp HBM, and crashes only when the chained
# dispatch exceeds the relay watchdog (i4=40 s OK, i20=202 s kill).
#
#   1) memanal f32  (remat): temp HBM with DCN blocks checkpointed
#   2) sweep   f32  (remat): s/iter + acc parity vs no-remat (8878)
#   3) memanal bf16 (remat) + sweep bf16
#   4) bench_gather2 re-run with phase-labeled failures (VERDICT #3)
set -u
cd "$(dirname "$0")/.."
out=results/plus_train_r5b.txt
: > "$out"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "== battery_r5b start $(stamp) ==" | tee -a "$out"

for dt in float32 bfloat16; do
  echo "-- probe memanal b8 $dt (remat=dcn) $(stamp)" | tee -a "$out"
  timeout 1800 python scripts/probe_dcn_bwd.py memanal 8 0 $dt >>"$out" 2>&1
  rc=$?
  echo "exit=$rc $(stamp)" | tee -a "$out"
  [ "$rc" -ne 0 ] && sleep 180

  echo "-- probe sweep b8 $dt (remat=dcn) $(stamp)" | tee -a "$out"
  timeout 2400 python scripts/probe_dcn_bwd.py sweep 8 0 $dt >>"$out" 2>&1
  rc=$?
  echo "exit=$rc $(stamp)" | tee -a "$out"
  [ "$rc" -ne 0 ] && sleep 180
done

gout=results/gather_r5.txt
echo "== bench_gather2 8 30 $(stamp) ==" > "$gout"
timeout 1800 python scripts/bench_gather2.py 8 30 >>"$gout" 2>&1
echo "exit=$? $(stamp)" | tee -a "$gout"

echo "== battery_r5b done $(stamp) ==" | tee -a "$out"
