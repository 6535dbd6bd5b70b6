#!/bin/bash
# Round-4 sweep D: the channel-major cols-conv kernel on chip (v2 after the
# Mosaic probe round), microbench + 3D epoch + a serving trial.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
LOG=${1:-/tmp/tpu_sweep_r4d.log}
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 1. kernel microbench at the hot geometries (fwd + grad)
run python tools/bench_tapsum.py z2d dec128 menc

# 2. Task002 3d_fullres epoch with the kernel (2 draws)
CSOF_CONV2D_IMPL=pallas run python tools/bench_epoch.py 1 saveconv
CSOF_CONV2D_IMPL=pallas run python tools/bench_epoch.py 1 saveconv

# 3. serving with the kernel routed into the 2D ConvNormActs (decoder +
#    memory encoder inner convs)
CSOF_CONV2D_IMPL=pallas CSOF_BENCH_DRAWS=3 run python bench.py

echo "SWEEP D DONE $(date +%H:%M:%S)" >> "$LOG"
