"""Tap-sum conv vs native XLA conv at the narrow-Cout hot geometries.

Motivation (docs/BENCHMARKS.md): XLA's implicit-matmul conv puts Cout on
the 128-lane MXU output dim, so the C=32 stages (SegFlow flow-decoder /
memory-encoder finest levels; the whole 3D fullres pipeline) cap at ~25%
lane occupancy — the measured ~8.5 TF/s decoder and the 26.8 TF/s "C=32
conv plateau". ops/tapsum_conv.py reformulates the same conv as one
matmul with Kh*Kw*Cout output lanes + fused shifted adds.

Cases (each: native vs tapsum, fwd and grad):
  dec128   b8  128x128  64->32  3x3   (SegFlow decoder finest fuse conv)
  dec64    b8   64x64   128->64 3x3   (decoder mid level)
  menc     b8  128x128   6->32  3x3   (memory encoder stem)
  z2d      b80 192x160  32->32  3x3   (Task002 3d_fullres via-2D inner conv)

Probe honesty (tools/_timing.py + bench_conv3d.py rules): output feeds the
next rep's input through a per-pixel tanh factor (linearity collapse
guard), quadratic loss for grads, one host fetch after the rep loop.

Usage: python tools/bench_tapsum.py [case ...]   (default: all)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

CASES = {
    "dec128": (8, 128, 128, 64, 32),
    "dec64": (8, 64, 64, 128, 64),
    "menc": (8, 128, 128, 6, 32),
    "z2d": (80, 192, 160, 32, 32),
}


def main(names):
    import jax
    import jax.numpy as jnp

    from csof_tpu.ops.tapsum_conv import conv2d_tapsum
    from tools._timing import fetch, time_state

    results = {}
    for name in names:
        b, h, w, ci, co = CASES[name]
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.rand(b, h, w, ci).astype(np.float32) - 0.5, jnp.bfloat16)
        wt = jnp.asarray(rng.rand(3, 3, ci, co).astype(np.float32) * 0.1, jnp.bfloat16)
        gflop = 2 * 9 * ci * co * b * h * w / 1e9

        def native(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def cols(x, w):
            return conv2d_tapsum(x, w, mode="cols")

        def taps(x, w):
            return conv2d_tapsum(x, w, mode="taps")

        def pallas(x, w):
            from csof_tpu.ops.pallas.conv import conv3x3_cols

            return conv3x3_cols(x, w, jax.default_backend() != "tpu")

        impls = [("native", native), ("cols", cols), ("taps", taps)]
        if (w * ci) % 128 == 0 and (w * co) % 128 == 0:
            impls.append(("pallas", pallas))

        for impl_name, conv in impls:
            # forward: per-pixel tanh feedback defeats linearity collapse
            @jax.jit
            def fwd_step(x, w):
                y = conv(x, w)
                f = 1.0 + jnp.bfloat16(2.0**-8) * jnp.tanh(
                    jnp.mean(y.astype(jnp.float32), -1, keepdims=True)
                ).astype(jnp.bfloat16)
                return x * f, w

            dt = time_state(lambda x, w: fwd_step(x, w), (x0, wt), reps=16)
            results[f"{name}.{impl_name}.fwd"] = {
                "ms": round(dt * 1e3, 3), "tfs": round(gflop / dt / 1e3, 1),
            }

            # grad: quadratic loss, feedback through the input grad
            @jax.jit
            def grad_step(x, w):
                def loss(x, w):
                    y = conv(x, w).astype(jnp.float32)
                    return jnp.mean(y * y)

                gx, gw = jax.grad(loss, (0, 1))(x, w)
                f = 1.0 + jnp.bfloat16(2.0**-8) * jnp.tanh(
                    gx.astype(jnp.float32)
                ).astype(jnp.bfloat16)
                return x * f, w + jnp.bfloat16(0.0) * gw

            dt = time_state(lambda x, w: grad_step(x, w), (x0, wt), reps=16)
            results[f"{name}.{impl_name}.grad"] = {
                "ms": round(dt * 1e3, 3), "tfs": round(3 * gflop / dt / 1e3, 1),
            }
        for what in ("fwd", "grad"):
            line = " vs ".join(
                f"{i} {results[f'{name}.{i}.{what}']['ms']} ms "
                f"({results[f'{name}.{i}.{what}']['tfs']} TF/s)"
                for i, _ in impls
            )
            print(f"{name} {what}: {line}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    main(names)
