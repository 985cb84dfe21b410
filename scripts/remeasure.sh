#!/usr/bin/env bash
# One-shot perf re-measurement battery (run when a TPU chip is attached).
# Round-2 code changes since the last on-chip numbers: multires gt targets
# (train step skips the device mask downsample), maskiou gating, detect
# crop plumbing, bench input perturbation.
#
#   bash scripts/remeasure.sh [out=results/remeasure.txt]
set -u
out="${1:-results/remeasure.txt}"
mkdir -p "$(dirname "$out")"
log() { echo "== $*" | tee -a "$out"; }

log "remeasure start $(date -u +%FT%TZ)"
log "inference fps"
for cfg in yolact_base yolact_resnet50 yolact_darknet53 yolact_im700 \
           yolact_plus_base yolact_plus_resnet50; do
  for b in 1 8; do
    BENCH_CONFIG=$cfg timeout 1200 python bench.py "$b" 50 bfloat16 \
      2>>"$out" | tee -a "$out"
  done
done

log "pipelined throughput (2 interleaved streams; steady-state, no per-frame drain)"
for b in 1 8; do
  BENCH_STREAMS=2 timeout 1200 python bench.py "$b" 50 bfloat16 \
    2>>"$out" | tee -a "$out"
done

log "train it/s (multires default)"
for dt in float32 bfloat16; do
  timeout 1200 python scripts/bench_train.py 8 20 "$dt" 2>>"$out" \
    | tee -a "$out"
done
log "train it/s (legacy full-res masks, A/B)"
BENCH_TRAIN_MULTIRES=0 timeout 1200 python scripts/bench_train.py 8 20 \
  bfloat16 2>>"$out" | tee -a "$out"
log "train it/s yolact_plus"
BENCH_TRAIN_CONFIG=yolact_plus_resnet50 timeout 1200 \
  python scripts/bench_train.py 8 10 bfloat16 2>>"$out" | tee -a "$out"
log "remeasure done $(date -u +%FT%TZ)"
