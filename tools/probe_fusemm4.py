"""Megakernel probe round 4 — final slopes before building.

Round-3 verdicts: in-kernel 2D transpose 6.8 us per (88,16640) f32 (CHEAP),
single-row writes free, value-level lax.dynamic_slice UNSUPPORTED in Mosaic
(use static slices, or pl.ds on refs), and the ~2 ms dispatch floor hides
anything below it — slopes only. Remaining unknowns:

  corrf — flattened-2D corr window slope (static slices, ref reads),
          27 vs 81 windows, level-0 whole-sample geometry
  corr3 — the SAME windows in the shipped kernel's 3D (C, H, W) access
          pattern, for apples-to-apples
  mmslp — fuse-conv matmul slope at the real tile shape (2304,256)@(256,288)
          and a 2x-M variant (4608) — is 11 TF/s the ceiling or an artifact?
  tapc  — tap-combine slope: 9 static sublane+lane slices + masked adds
  calib — shipped corr kernel per-call slope, 1 vs 9 chained calls

Usage: python tools/probe_fusemm4.py [all|corrf|corr3|mmslp|tapc|calib]
"""

from __future__ import annotations

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

W = 128
H = 128
C = 32
P = H * W  # out-pixel space (one whole level-0 sample)


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
          f"{s*1e6:.2f} us/{unit}", flush=True)
    return s


def probe_corrf():
    pad = 10  # rows of zero halo each side
    pall = P + 2 * pad * W

    def make_call(r_windows):
        def kernel(q_ref, m_ref, o_ref):
            qv = q_ref[:]  # (C, P) f32 at out-pixel rows
            col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) % W
            n = 0
            for dx in range(-4, 5):
                sh = dx * 2
                mask = ((col + sh >= 0) & (col + sh < W)).astype(jnp.float32)
                for dy in range(-4, 5):
                    if n >= r_windows:
                        break
                    off = (pad + dy * 2) * W + sh  # static, unaligned ok
                    mm = m_ref[:, off : off + P]
                    kk = (dy + 4) * 9 + (dx + 4)
                    o_ref[kk] = (jnp.sum(qv * mm, axis=0, keepdims=True) * mask)[0]
                    n += 1

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((88, P), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    q = jnp.asarray(np.random.RandomState(0).rand(C, P), jnp.float32)
    m = jnp.asarray(np.random.RandomState(1).rand(C, pall), jnp.float32)
    slope("corrf flat (C,P) windows", make_call, (q, m), 27, 81, unit="window")


def probe_corr3():
    pad = 10
    hall = H + 2 * pad

    def make_call(r_windows):
        def kernel(q_ref, m_ref, o_ref):
            qv = q_ref[:]  # (C, H, W) f32
            col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            n = 0
            for dx in range(-4, 5):
                sh = dx * 2
                m_dx = pltpu.roll(m_ref[:], (-sh) % W, axis=2) if sh else m_ref[:]
                mask = ((col + sh >= 0) & (col + sh < W)).astype(jnp.float32)
                for dy in range(-4, 5):
                    if n >= r_windows:
                        break
                    oy = pad + dy * 2
                    mm = m_dx[:, oy : oy + H, :]
                    kk = (dy + 4) * 9 + (dx + 4)
                    o_ref[0, kk] = jnp.sum(qv * mm, axis=0) * mask
                    n += 1

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 88, H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    q = jnp.asarray(np.random.RandomState(0).rand(C, H, W), jnp.float32)
    m = jnp.asarray(np.random.RandomState(1).rand(C, hall, W), jnp.float32)
    slope("corr3 shipped-style (C,H,W) windows", make_call, (q, m), 27, 81,
          unit="window")


def probe_mmslp():
    for m_rows in (2304, 4608):
        k, n = 256, 288

        def make_call(r, m_rows=m_rows):
            def kernel(x_ref, w_ref, o_ref):
                acc = jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.float32)
                for i in range(r - 1):
                    # chain: next lhs depends on previous acc (no dead code,
                    # no growing live set — acc is reused)
                    x = x_ref[:] + acc[:, :1].astype(x_ref.dtype) * 1e-6
                    acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
                o_ref[:] = acc

            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((m_rows, n), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )

        x = jnp.asarray(np.random.RandomState(0).rand(m_rows, k), jnp.bfloat16)
        w = jnp.asarray(np.random.RandomState(1).rand(k, n), jnp.bfloat16)
        s = slope(f"mmslp ({m_rows},{k})@({k},{n})", make_call, (x, w), 2, 8,
                  unit="matmul")
        print(f"  -> {2*m_rows*k*n/s/1e12:.1f} TF/s marginal", flush=True)


def probe_tapc():
    th = 16
    pt, f = (th + 4) * W, 32
    n9 = 9 * f

    def make_call(r):
        def kernel(w_ref, o_ref):
            wide = w_ref[:]
            col = jax.lax.broadcasted_iota(jnp.int32, (th * W, 1), 0) % W
            acc = jnp.zeros((th * W, f), jnp.float32)
            n = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if n >= r:
                        break
                    p0 = (2 + dy) * W + dx
                    j = ((dy + 1) * 3 + (dx + 1)) * f
                    term = wide[p0 : p0 + th * W, j : j + f]
                    if dx:
                        mask = ((col + dx >= 0) & (col + dx < W)).astype(jnp.float32)
                        term = term * mask
                    acc = acc + term
                    n += 1
            o_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((th * W, f), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    wide = jnp.asarray(np.random.RandomState(0).rand(pt, n9), jnp.float32)
    slope(f"tapc slices+adds ({th*W},{f})", make_call, (wide,), 3, 9,
          unit="tap")


def probe_calib():
    from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas_batched

    q = jnp.asarray(np.random.RandomState(0).rand(8, 128, 128, 32), jnp.bfloat16)
    m = jnp.asarray(np.random.RandomState(1).rand(8, 128, 128, 32), jnp.bfloat16)

    def make_call(r):
        def call(q, m):
            out = None
            for i in range(r):
                # chain: each call's query depends on the previous output
                qq = q if out is None else q * (1 + out[0, 0, 0, 0] * 1e-9)
                out = local_correlation_volume_pallas_batched(
                    qq, m, radius=4, stride=2
                )
            return out
        return call

    slope("calib shipped corr (B=8, 128^2)", make_call, (q, m), 1, 9,
          unit="call(B=8)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    for name, fn in (
        ("corrf", probe_corrf),
        ("corr3", probe_corr3),
        ("mmslp", probe_mmslp),
        ("tapc", probe_tapc),
        ("calib", probe_calib),
    ):
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}"[:500], flush=True)
