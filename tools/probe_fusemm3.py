"""Megakernel probe round 3 — SLOPE-based timing.

Round-2 lesson: each jit dispatch on this backend costs ~1 ms, so
single-call probe numbers are dispatch floor, not kernel cost. Every probe
here runs the primitive R1 and R2 times CHAINED (data-dependent) inside
one kernel/jit and reports the SLOPE (t2-t1)/(R2-R1) — the marginal cost
of one primitive instance.

  calib — the SHIPPED corr kernel at level-0 B=8 (1 vs 2 chained calls at
          the XLA level): what the megakernel's corr part must match.
  corrs — flattened-2D corr, dx-roll-only access pattern (9 rolls, dy via
          aligned lane slices), R windows per call.
  trans — in-kernel (88, P)<->(P, 88) f32 transposes, chained.
  rowwr — single-sublane-row writes into (88, P), R writes.
  mmch  — chained (2048, 256)@(256, 384) bf16 matmuls.

Usage: python tools/probe_fusemm3.py [all|calib|corrs|trans|rowwr|mmch]
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("CSOF_CORR_IMPL", "pallas")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import time_state

P = 16640  # (128+2) rows x 128 lanes
W = 128


def _time_call(call, args, reps=24):
    @jax.jit
    def step(*state):
        *xs, acc = state
        o = call(*xs)
        o0 = o[0] if isinstance(o, (tuple, list)) else o
        return (*[x * (1 + 2e-7) for x in xs],
                acc + o0.reshape(-1)[0].astype(jnp.float32))

    return time_state(step, (*args, jnp.float32(0.0)), reps=reps)


def slope(name, make_call, args, r1, r2, unit="inst"):
    t1 = _time_call(make_call(r1), args)
    t2 = _time_call(make_call(r2), args)
    s = (t2 - t1) / (r2 - r1)
    print(f"{name}: t({r1})={t1*1e6:.0f}us t({r2})={t2*1e6:.0f}us -> "
          f"{s*1e6:.2f} us/{unit}")
    return s


def probe_calib():
    """Shipped corr kernel, level-0 geometry, B=8 — chained at XLA level."""
    from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas_batched

    q = jnp.asarray(np.random.RandomState(0).rand(8, 128, 128, 32), jnp.bfloat16)
    m = jnp.asarray(np.random.RandomState(1).rand(8, 128, 128, 32), jnp.bfloat16)

    def make_call(r):
        def call(q, m):
            out = None
            for i in range(r):
                o = local_correlation_volume_pallas_batched(
                    q * (1.0 + 1e-6 * i), m, radius=4, stride=2
                )
                out = o if out is None else out + o
            return out
        return call

    slope("calib shipped corr (B=8, 128^2, C32, r4 s2)", make_call, (q, m),
          1, 3, unit="call(B=8)")


def probe_corrs(n_windows=(27, 81)):
    """Flattened corr, dx-outer rolls + dy aligned slices, R windows."""
    c = 32
    pall = P + 2 * 10 * W  # 10-row zero halo each side

    def make_call(r_windows):
        def kernel(q_ref, m_ref, o_ref):
            qv = q_ref[:]  # (C, P) f32, X-row space
            col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) % W
            n = 0
            for dx in range(-4, 5):
                sh = dx * 2
                m_dx = m_ref[:]
                m_dx = pltpu.roll(m_dx, (-sh) % pall, axis=1) if sh else m_dx
                mask = ((col + sh >= 0) & (col + sh < W)).astype(jnp.float32)[0]
                for dy in range(-4, 5):
                    if n >= r_windows:
                        break
                    off = (10 + dy * 2) * W  # aligned lane slice (W=128)
                    mm = jax.lax.dynamic_slice(m_dx, (0, off), (c, P))
                    kk = (dy + 4) * 9 + (dx + 4)
                    o_ref[kk] = jnp.sum(qv * mm, axis=0) * mask
                    n += 1
            return

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((88, P), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    q = jnp.asarray(np.random.RandomState(0).rand(32, P), jnp.float32)
    m = jnp.asarray(np.random.RandomState(1).rand(32, pall), jnp.float32)
    slope("corrs flat windows (C=32, P=16640)", make_call, (q, m),
          *n_windows, unit="window")


def probe_trans():
    def make_call(r):
        def kernel(x_ref, o_ref):
            t = jnp.transpose(x_ref[:])  # (P, 88)
            for _ in range(r - 1):
                t = jnp.transpose(jnp.transpose(t) * 1.000001)
            o_ref[:] = t

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, 88), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    x = jnp.asarray(np.random.RandomState(0).rand(88, P), jnp.float32)
    # r transposes-with-round-trip = 2r-1 raw transposes
    t1 = _time_call(make_call(1), (x,))
    t2 = _time_call(make_call(4), (x,))
    s = (t2 - t1) / 6  # 7 raw vs 1 raw
    print(f"trans (88,{P}) f32: t(1)={t1*1e6:.0f}us t(7)={t2*1e6:.0f}us -> "
          f"{s*1e6:.2f} us/transpose")


def probe_rowwr():
    def make_call(r):
        def kernel(q_ref, o_ref):
            qv = q_ref[:]
            for kk in range(r):
                o_ref[kk] = jnp.sum(qv * float(kk + 1), axis=0)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((88, P), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    q = jnp.asarray(np.random.RandomState(0).rand(8, P), jnp.float32)
    slope("rowwr sum(8,P)+row write", make_call, (q,), 11, 81, unit="write")


def probe_mmch():
    m, k, n = 2048, 256, 384

    def make_call(r):
        def kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((m, n), jnp.float32)
            for i in range(r):
                acc = acc + jnp.dot(
                    x_ref[pl.ds((i % 8) * m, m), :], w_ref[:],
                    preferred_element_type=jnp.float32,
                )
            o_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    x = jnp.asarray(np.random.RandomState(0).rand(8 * m, k), jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).rand(k, n), jnp.bfloat16)
    s = slope(f"mmch ({m},{k})@({k},{n})", make_call, (x, w), 2, 10,
              unit="matmul")
    print(f"  -> {2*m*k*n/s/1e12:.1f} TF/s marginal")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    for name, fn in (
        ("calib", probe_calib),
        ("corrs", probe_corrs),
        ("trans", probe_trans),
        ("rowwr", probe_rowwr),
        ("mmch", probe_mmch),
    ):
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}"[:500])
