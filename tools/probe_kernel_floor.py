"""Measure the per-kernel execution floor on the axon TPU backend.

The serving-config attribution (docs/BENCHMARKS.md isolate12) says the
SegFlow scan step is a serial chain of ~50 small kernels at ~5.3 ms/step,
and the dec_* probes in bench_conv3d.py found every decoder-scale conv
landing at ~0.5 ms wall regardless of FLOPs (7.6 TF/s for the base shape,
36 TF/s raw for a 4x-FLOP packed shape — same wall time). Hypothesis: a
fixed per-kernel cost dominates at these sizes.

This probe times straight-line chains of K *unfusable* ops (sequential
matmuls / convs — XLA cannot fuse dot->dot) at several sizes, inside ONE
jit program, fetch-synced (tools/_timing.py). If wall/K is ~constant
across sizes, that's the per-kernel floor; the serving lever is then
kernel COUNT, not FLOP rate.

Usage: python tools/probe_kernel_floor.py    (on the TPU)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

K = 64  # ops per chain


def run(name, mk_op, x_shape, flops_per_op):
    import jax
    import jax.numpy as jnp

    from tools._timing import time_state

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*x_shape), jnp.bfloat16)
    op = mk_op()

    @jax.jit
    def step(x, k):
        y = x
        for _ in range(K):
            y = op(y)
            # renormalize so magnitudes stay O(1); rsqrt(mean(sq)) fuses
            # into the next op's epilogue-free chain as one extra kernel at
            # most — per-kernel floor conclusions only need the ORDER
            s = jnp.mean(jnp.square(y.astype(jnp.float32)))
            y = y * jax.lax.rsqrt(jnp.maximum(s, 1e-6)).astype(y.dtype)
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return y * (1.0 + 2.0 ** -7 * sign).astype(y.dtype), k + 1

    sec = time_state(step, (x, jnp.int32(0)), reps=8) / K
    print(
        json.dumps(
            {
                "case": name,
                "us_per_op": round(sec * 1e6, 1),
                "tflops": round(flops_per_op / sec / 1e12, 2),
            }
        ),
        flush=True,
    )


def main():
    import jax.numpy as jnp

    def mk_dot(n):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.rand(n, n) * (1.0 / np.sqrt(n)), jnp.bfloat16)

        def op(y):
            return y @ w

        return lambda: op

    def mk_conv(c):
        import jax

        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.rand(3, 3, c, c) * 0.1, jnp.bfloat16)

        def op(y):
            return jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        return lambda: op

    # tiny -> medium dots: wall/K constant across 100x FLOP range = floor
    run("dot_128", mk_dot(128), (128, 128), 2 * 128 ** 3)
    run("dot_512", mk_dot(512), (512, 512), 2 * 512 ** 3)
    run("dot_1024", mk_dot(1024), (1024, 1024), 2 * 1024 ** 3)
    # decoder-geometry convs at three batch sizes (serving uses B=8)
    for b in (1, 8, 32):
        run(
            f"conv128sq_c32_b{b}",
            mk_conv(32),
            (b, 128, 128, 32),
            2 * b * 128 * 128 * 9 * 32 * 32,
        )


if __name__ == "__main__":
    main()
