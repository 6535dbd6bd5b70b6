#!/usr/bin/env bash
# Shard inference cases across N workers (ref: predict_simple.py
# --num_parts/--part_id multi-GPU sharding -> same pattern across TPU hosts).
#
#   bash scripts/predict_sharded.sh <model_dir> <input> <output> <num_parts>
set -euo pipefail
MODEL=${1:?} IN=${2:?} OUT=${3:?} N=${4:-4}
for ((i=0; i<N; i++)); do
  python -c "from csof_tpu.cli.main import predict_entry as f; f(['-m','$MODEL','-i','$IN','-o','$OUT','--num-parts','$N','--part-id','$i'])" &
done
wait
