#!/bin/bash
# Round-4 sweep B: the serving-config pick (concat vs split vs split+hoist),
# the corr-backward jnp baseline (pallas v2 numbers already captured in
# /tmp/tpu_sweep_r4.log), and SegFlow training with the pallas v2 backward.
# One TPU job at a time (CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
LOG=${1:-/tmp/tpu_sweep_r4b.log}
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 1. serving pick: does the q_cm split + conv_q hoist beat concat on chip?
run python tools/bench_explore.py r4serve

# 2. corr backward: XLA shifted-slice baseline at the same geometries as
#    the already-captured pallas v2 run
run python tools/bench_corr_bwd.py jnp

# 3. SegFlow training step with the pallas v2 corr backward (default jnp
#    measured 79.8/87.6 f/s at b=4 in sweep A)
CSOF_CORR_BWD=pallas run python tools/bench_segflow_train.py 4
CSOF_CORR_BWD=pallas run python tools/bench_segflow_train.py 4

echo "SWEEP B DONE $(date +%H:%M:%S)" >> "$LOG"
