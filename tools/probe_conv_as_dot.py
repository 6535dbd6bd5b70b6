"""Probe: XLA conv vs explicit im2col+dot at SegFlow serving shapes.

Round-4 finding (docs/BENCHMARKS.md): the serving step is bound by ~50
substantial kernels at ~80-130 us each, and the measured per-op costs are
wildly asymmetric — attention dots run ~20 us while same-byte convs run
~130-170 us. If the backend's conv lowering carries a large fixed cost at
small shapes, re-expressing the conv as [pad -> 9 shifted slices stacked on
channels -> one dot] (exact same math) may win despite materializing the
im2col buffer.

Variants at (8, H, W, Cin)->(3,3,Cin,Co), SAME, stride 1:
  conv    — jax.lax.conv_general_dilated (today's path)
  im2col  — explicit concat of 9 shifted slices + reshape + one dot
  patches — lax.conv_general_dilated_patches + dot
  dotsum  — 9 shifted 1x1 dots accumulated (no materialization)

Usage: python tools/probe_conv_as_dot.py   (on the TPU)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

CHAIN = 8


def run(name, h, w, ci, co, variant):
    import jax
    import jax.numpy as jnp

    from tools._timing import time_state

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, h, w, ci), jnp.bfloat16)
    wk = jnp.asarray(rng.rand(3, 3, ci, co) * 0.1, jnp.bfloat16)

    def conv(y, wk):
        return jax.lax.conv_general_dilated(
            y, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def im2col(y, wk):
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [yp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
            axis=-1,
        )
        return cols.reshape(8 * h * w, 9 * ci) @ wk.reshape(9 * ci, co)

    def patches(y, wk):
        p = jax.lax.conv_general_dilated_patches(
            y, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )  # (8, h, w, ci*9) with ci-major taps
        wperm = jnp.transpose(wk, (2, 0, 1, 3)).reshape(ci * 9, co)
        return p.reshape(8 * h * w, ci * 9) @ wperm

    def dotsum(y, wk):
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = yp[:, dy : dy + h, dx : dx + w, :].reshape(8 * h * w, ci) @ wk[dy, dx]
                acc = t if acc is None else acc + t
        return acc

    f = {"conv": conv, "im2col": im2col, "patches": patches, "dotsum": dotsum}[variant]

    @jax.jit
    def step(x, wk, k):
        y = x
        for _ in range(CHAIN):
            out = f(y, wk).reshape(8, h, w, co)
            s = jnp.mean(jnp.square(out.astype(jnp.float32)))
            if ci == co:
                y = out * jax.lax.rsqrt(jnp.maximum(s, 1e-6)).astype(out.dtype)
            else:
                fb = jnp.tanh(jnp.mean(out.astype(jnp.float32), axis=-1, keepdims=True))
                y = y * (1.0 + 0.001 * fb).astype(y.dtype)
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return y * (1.0 + 2.0 ** -7 * sign).astype(y.dtype), wk, k + 1

    sec = time_state(step, (x, wk, jnp.int32(0)), reps=8) / CHAIN
    flops = 2 * 8 * h * w * 9 * ci * co
    print(
        json.dumps(
            {
                "case": f"{name}_{variant}",
                "us": round(sec * 1e6, 1),
                "tflops": round(flops / sec / 1e12, 2),
            }
        ),
        flush=True,
    )


def main():
    cases = [("dec128", 128, 128, 64, 32), ("dec128b", 128, 128, 32, 32),
             ("fuse128", 128, 128, 145, 32), ("menc64", 64, 64, 64, 64)]
    variants = sys.argv[1:] or ["conv", "im2col", "patches", "dotsum"]
    for name, h, w, ci, co in cases:
        for v in variants:
            run(name, h, w, ci, co, v)


if __name__ == "__main__":
    main()
