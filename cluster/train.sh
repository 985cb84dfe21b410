#!/usr/bin/env bash
# Multi-host TPU-pod training launcher (replaces the reference's slurm
# train.sh). Run the same command on every TPU VM worker, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="bash cluster/train.sh yolact_base 64"
# jax.distributed.initialize() picks up the TPU pod topology automatically.
set -e
CONFIG=${1:-yolact_base}
BATCH=${2:-8}
python -m yolact_tpu.cli.train --config="$CONFIG" --batch_size="$BATCH" "${@:3}"
