#!/usr/bin/env bash
# Multi-host TPU-pod training launch (the reference's SLURM scripts'
# equivalent, ref: nnunet/jean_zay_script_*.sh / scai_cluster_*.sh).
#
# On a TPU pod each host runs the same program; jax.distributed picks up the
# topology from the TPU runtime env. Usage (per host, e.g. via gcloud
# compute tpus tpu-vm ssh --worker=all):
#
#   bash scripts/train_tpu_pod.sh <config.yaml> <preprocessed_root> <out_dir> [fold]
set -euo pipefail

CONFIG=${1:?config.yaml}
PRE=${2:?preprocessed root}
OUT=${3:?output dir}
FOLD=${4:-0}

export CSOF_MULTIHOST=1
python - "$CONFIG" "$PRE" "$OUT" "$FOLD" <<'PY'
import sys

import jax

# multi-host init: no-op on a single host, rendezvous on a pod slice
try:
    jax.distributed.initialize()
except Exception as e:  # single-host / already initialized
    print(f"jax.distributed.initialize skipped: {e}")

from csof_tpu.cli.main import train_entry

config, pre, out, fold = sys.argv[1:5]
train_entry(["-c", config, "-p", pre, "-o", out, "-f", fold])
PY
