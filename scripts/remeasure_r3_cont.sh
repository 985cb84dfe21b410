#!/usr/bin/env bash
# Continuation of scripts/remeasure_r3.sh after the 2026-08-19 01:49 session
# interrupt: yolact_base b1/b8 rows already captured in results/remeasure_r3.txt
# (251.7 / 587.41); plus_resnet50 new-DCN rows live in results/dcn_r3b.txt
# (123.76 b1 / 150.45 b8).  This script appends the remaining rows.
#
#   bash scripts/remeasure_r3_cont.sh [out=results/remeasure_r3.txt]
set -u
out="${1:-results/remeasure_r3.txt}"
mkdir -p "$(dirname "$out")"
log() { echo "== $*" | tee -a "$out"; }

log "remeasure_r3 continuation start $(date -u +%FT%TZ)"
for cfg in yolact_resnet50 yolact_im700 yolact_plus_base; do
  for b in 1 8; do
    BENCH_CONFIG=$cfg timeout 1800 python bench.py "$b" 50 bfloat16 \
      2>>"$out" | tee -a "$out"
  done
done

log "pipelined throughput (2 interleaved streams; steady-state, no per-frame drain)"
for b in 1 8; do
  BENCH_STREAMS=2 timeout 1800 python bench.py "$b" 50 bfloat16 \
    2>>"$out" | tee -a "$out"
done

log "train it/s (multires default)"
for dt in float32 bfloat16; do
  timeout 1800 python scripts/bench_train.py 8 20 "$dt" 2>>"$out" \
    | tee -a "$out"
done
log "train it/s (legacy full-res masks, A/B)"
BENCH_TRAIN_MULTIRES=0 timeout 1800 python scripts/bench_train.py 8 20 \
  bfloat16 2>>"$out" | tee -a "$out"
log "train it/s yolact_plus (new DCN)"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 1800 \
  python scripts/bench_train.py 8 10 bfloat16 2>>"$out" | tee -a "$out"
log "remeasure_r3 done $(date -u +%FT%TZ)"
