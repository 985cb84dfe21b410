#!/usr/bin/env bash
# Round-3 chip session: fused Pallas DCN (kernels/dcn_pallas.py) probes.
#
#   bash scripts/dcn_pallas_probe.sh [out=results/dcn_pallas_r3.txt]
#
# Order matters: correctness at real stage shapes first (compiled, not
# interpret), then the in-kernel gather formulation probes, then the
# full-model A/B against the XLA DCN rows already in results/dcn_r3b.txt
# (123.76 b1 / 150.45 b8 yolact_plus_resnet50).
set -u
out="${1:-results/dcn_pallas_r3.txt}"
mkdir -p "$(dirname "$out")"
log() { echo "== $*" | tee -a "$out"; }

log "dcn_pallas probe start $(date -u +%FT%TZ)"

log "compiled parity at real yolact_plus stage shapes"
timeout 1800 python scripts/dcn_pallas_check.py 2>>"$out" | tee -a "$out"

log "in-kernel gather formulation probes (bench_gather2)"
timeout 1800 python scripts/bench_gather2.py 8 30 2>>"$out" | tee -a "$out"

log "full-model A/B: fused Pallas DCN vs XLA DCN (plus_resnet50)"
for b in 8 1; do
  YOLACT_TPU_PALLAS_DCN=1 BENCH_CONFIG=yolact_plus_resnet50 \
    timeout 2400 python bench.py "$b" 50 bfloat16 2>>"$out" | tee -a "$out"
done

log "full-model A/B: loop-gather variant (if taa regressed)"
for b in 8; do
  YOLACT_TPU_PALLAS_DCN=1 YOLACT_TPU_PALLAS_DCN_LOOP=1 \
    BENCH_CONFIG=yolact_plus_resnet50 \
    timeout 2400 python bench.py "$b" 50 bfloat16 2>>"$out" | tee -a "$out"
done

log "full-model A/B: plus_base with the winner"
for b in 8 1; do
  YOLACT_TPU_PALLAS_DCN=1 BENCH_CONFIG=yolact_plus_base \
    timeout 2400 python bench.py "$b" 50 bfloat16 2>>"$out" | tee -a "$out"
done

log "dcn_pallas probe done $(date -u +%FT%TZ)"
