#!/usr/bin/env bash
# Multi-host training launcher (reference surface: scripts/dist_train.sh).
#
# The reference wraps torch.distributed.launch; on TPU pods each host runs
# the SAME command and jax.distributed.initialize() (ssl_tpu/train.py,
# enabled with --launcher jax) discovers the pod topology from the TPU
# runtime — no process launcher or master port is needed:
#
#   # on every TPU VM worker (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`):
#   ./scripts/dist_train.sh options/train/ESRGANSSL/train_ESRGANSSL_bicubic_x4.yml
#
# Single-host multi-chip needs no launcher at all: the device mesh in
# ssl_tpu/parallel covers all local chips.

CONFIG=$1
if [ $# -lt 1 ]; then
    echo "usage: ./scripts/dist_train.sh [path to option file] [extra args...]"
    exit 1
fi

PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH}" \
python -m ssl_tpu.train -opt "$CONFIG" --launcher jax "${@:2}"
