#!/usr/bin/env bash
set -e
MODEL=${1:?usage: eval.sh <trained_model> [extra flags]}
python -m yolact_tpu.cli.eval --trained_model="$MODEL" "${@:2}"
