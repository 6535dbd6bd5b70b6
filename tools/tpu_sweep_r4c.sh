#!/bin/bash
# Round-4 sweep C: the attn_fused serving lever, the Pallas cols-conv
# microbench + 3D epoch, and the post-default-flip train number.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
LOG=${1:-/tmp/tpu_sweep_r4c.log}
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 1. serving: pair-batched attention bottlenecks on concat (the r4serve
#    winner) and on split+hoist, exact same math
run python tools/bench_explore.py r4serve2

# 2. Pallas cols conv vs native/tapsum at the hot geometries (fwd + grad)
run python tools/bench_tapsum.py z2d dec128 menc

# 3. Task002 3d_fullres epoch with the Pallas conv kernel (2 draws for the
#    compile lottery), then the current default for the same-day baseline
CSOF_CONV2D_IMPL=pallas run python tools/bench_epoch.py 1 saveconv
CSOF_CONV2D_IMPL=pallas run python tools/bench_epoch.py 1 saveconv
run python tools/bench_epoch.py 1 saveconv

# 4. SegFlow train step with the now-default pallas corr backward
run python tools/bench_segflow_train.py 4

echo "SWEEP C DONE $(date +%H:%M:%S)" >> "$LOG"
