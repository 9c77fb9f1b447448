#!/usr/bin/env bash
# Multi-host testing launcher (reference surface: scripts/dist_test.sh).
# See dist_train.sh for the TPU-pod launch model.

CONFIG=$1
if [ $# -lt 1 ]; then
    echo "usage: ./scripts/dist_test.sh [path to option file] [extra args...]"
    exit 1
fi

PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH}" \
python -m ssl_tpu.test -opt "$CONFIG" --launcher jax "${@:2}"
