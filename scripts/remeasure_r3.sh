#!/usr/bin/env bash
# Round-3 perf battery (run when a TPU chip is attached).
# Code changes since results/targeted_r3.txt: DCN single corner-reduce +
# canonical 2D GEMM (commit 2eea24b).  darknet53 + old-code plus rows live
# in results/targeted_r3.txt; new-code plus_resnet50 rows in results/
# dcn_r3b.txt.
#
#   bash scripts/remeasure_r3.sh [out=results/remeasure_r3.txt]
set -u
out="${1:-results/remeasure_r3.txt}"
mkdir -p "$(dirname "$out")"
log() { echo "== $*" | tee -a "$out"; }

log "remeasure_r3 start $(date -u +%FT%TZ)"
log "inference fps (post-DCN-rework code)"
for cfg in yolact_base yolact_resnet50 yolact_im700 yolact_plus_base; do
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
