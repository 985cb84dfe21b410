#!/usr/bin/env bash
set -e
CONFIG=${1:-yolact_base}
BATCH=${2:-8}
python -m yolact_tpu.cli.train --config="$CONFIG" --batch_size="$BATCH" --resume=latest "${@:3}"
