#!/bin/bash
# Round-4 on-chip measurement sweep: run ONE AT A TIME the moment the TPU
# tunnel is back (CLAUDE.md: one TPU job at a time; remote compiles are
# minutes-slow but cached). Appends everything to $LOG.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
LOG=${1:-/tmp/tpu_sweep_r4.log}
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 1. re-establish the driver evidence chain: the serving bench as-is
CSOF_BENCH_DRAWS=3 run python bench.py

# 2. tap-sum conv at the hot geometries (fwd + grad, native vs tapsum)
run python tools/bench_tapsum.py

# 3. serving bench with tap-sum convs enabled (the round-4 candidate)
CSOF_CONV2D_IMPL=tapsum CSOF_BENCH_DRAWS=3 run python bench.py

# 4. Pallas corr backward v2 vs XLA shifted-slice (VERDICT item 4)
run python tools/bench_corr_bwd.py

# 5. 3D fullres epoch: current default, then with tap-sum inner convs
run python tools/bench_epoch.py 1 saveconv
CSOF_CONV2D_IMPL=tapsum run python tools/bench_epoch.py 1 saveconv

# 6. SegFlow training throughput re-sweep (b=4), then with tapsum
run python tools/bench_segflow_train.py 4
CSOF_CONV2D_IMPL=tapsum run python tools/bench_segflow_train.py 4

echo "SWEEP DONE $(date +%H:%M:%S)" >> "$LOG"
