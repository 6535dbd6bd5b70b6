"""Compile-check + slope-time the fused skip-fuse megakernel per level.

Builds ONE fused_skip_fuse call at each SegFlow serving level geometry
(B=8 via vmap) instead of the whole 12-step model — fast iteration on
Mosaic lowering errors, and a per-level marginal cost via 1-vs-4 chained
calls (see tools/probe_fusemm4.py for the slope method).

Usage: python tools/probe_fusedlevel.py [0|1|2|all]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

from _timing import time_state

LEVELS = [  # (C, H, W, radius, stride) at the 128^2 serving geometry
    (32, 128, 128, 4, 2),
    (64, 64, 64, 4, 1),
    (128, 32, 32, 4, 1),
]


def probe_level(lvl: int):
    from csof_tpu.ops.pallas.skipfuse import fused_skip_fuse

    c, h, w, radius, stride = LEVELS[lvl]
    k2 = (2 * radius + 1) ** 2
    f = c
    rng = np.random.RandomState(lvl)
    q = jnp.asarray(rng.randn(8, c, h, w), jnp.bfloat16)
    m = jnp.asarray(rng.randn(8, c, h, w), jnp.bfloat16)
    wk = jnp.asarray(rng.randn(3, 3, 2 * c + k2, f) * 0.05, jnp.float32)
    cb = jnp.zeros((f,), jnp.float32)
    gs = jnp.ones((f,), jnp.float32)
    gb = jnp.zeros((f,), jnp.float32)

    def make_call(r):
        def call(q, m):
            out = None
            for _ in range(r):
                qq = q if out is None else q * (1 + out[0, 0, 0, 0].astype(jnp.bfloat16) * 1e-8)
                out = jax.vmap(
                    lambda a_, b_: fused_skip_fuse(
                        a_, b_, wk, cb, gs, gb, radius=radius, stride=stride
                    )
                )(qq, m)
            return out
        return call

    @jax.jit
    def step1(q, m, acc):
        o = make_call(1)(q, m)
        return q * (1 + 2e-7), m, acc + o[0, 0, 0, 0].astype(jnp.float32)

    @jax.jit
    def step4(q, m, acc):
        o = make_call(4)(q, m)
        return q * (1 + 2e-7), m, acc + o[0, 0, 0, 0].astype(jnp.float32)

    t1 = time_state(step1, (q, m, jnp.float32(0.0)), reps=16)
    t4 = time_state(step4, (q, m, jnp.float32(0.0)), reps=16)
    s = (t4 - t1) / 3
    print(f"level{lvl} (C{c} {h}x{w} r{radius}s{stride}): t1={t1*1e6:.0f}us "
          f"t4={t4*1e6:.0f}us -> {s*1e6:.1f} us/call(B=8)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    for lvl in range(3):
        if which in (str(lvl), "all"):
            try:
                probe_level(lvl)
            except Exception as e:
                print(f"level{lvl}: FAILED {type(e).__name__}: {e}"[:2000],
                      flush=True)
