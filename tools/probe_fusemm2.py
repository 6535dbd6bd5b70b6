"""Megakernel probe round 2 (see probe_fusemm.py for round 1).

Round-1 verdicts on this backend: lhs-TRANSPOSED dot_general is ~scalar
speed (0.09 TF/s) and jnp.concatenate row assembly is ~1.6 ms — both dead.
Revised design: corr stays CHANNEL-MAJOR (kk on the untiled leading axis,
per-kk plane writes, as the shipped kernel does), then ONE explicit 2D
transpose puts it channels-last for STANDARD-orientation matmuls. Probes:

  tr88   — jnp.transpose (88, P) f32 -> (P, 88)   [corr -> channels-last]
  tr32   — jnp.transpose (32, P) f32 -> (P, 32)   [q/m cm -> channels-last]
  trbig  — transpose + use: (88, P) -> (P, 88) feeding one matmul
  mmstd  — standard matmul (2048, 256) @ (256, 384) bf16 -> f32 (fuse conv
           chunk shape, tap-widened N = 9F)
  rowwr  — 81 direct single-row writes o_ref[kk] = vec (no concatenate)

Usage: python tools/probe_fusemm2.py [all|tr88|tr32|mmstd|rowwr]
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import time_state

P = 16640  # level-0 sample: (128+2) rows x 128 lanes, flattened


def _timeit(name, call, args, reps=32, extra=""):
    @jax.jit
    def step(*state):
        *xs, acc = state
        o = call(*xs)
        o0 = o[0] if isinstance(o, (tuple, list)) else o
        return (*[x * (1 + 2e-7) for x in xs], acc + o0[0, 0].astype(jnp.float32))

    dt = time_state(step, (*args, jnp.float32(0.0)), reps=reps)
    print(f"{name}: {dt*1e6:.1f} us/call {extra}")
    return dt


def probe_tr(rows, name):
    x = jnp.asarray(np.random.RandomState(0).rand(rows, P), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, rows), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    mb = rows * P * 4 / 1e6
    _timeit(f"{name} transpose ({rows},{P})->({P},{rows})", call, (x,),
            extra=f"({mb:.1f} MB)")


def probe_mmstd():
    m, k, n = 2048, 256, 384
    x = jnp.asarray(np.random.RandomState(0).rand(m, k), jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).rand(k, n), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt = _timeit(f"mmstd ({m},{k})@({k},{n})", call, (x, w))
    print(f"  -> {2*m*k*n/dt/1e12:.1f} TF/s")


def probe_mm8():
    """8 chunked matmuls in one kernel (the per-sample fuse conv shape)."""
    m, k, n = 2048, 256, 384
    x = jnp.asarray(np.random.RandomState(0).rand(8 * m, k), jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).rand(k, n), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        for i in range(8):
            o_ref[pl.ds(i * m, m), :] = jnp.dot(
                x_ref[pl.ds(i * m, m), :], w_ref[:],
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8 * m, n), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt = _timeit(f"mm8 8x(({m},{k})@({k},{n}))", call, (x, w))
    print(f"  -> {8*2*m*k*n/dt/1e12:.1f} TF/s")


def probe_rowwr():
    q = jnp.asarray(np.random.RandomState(0).rand(32, P), jnp.float32)

    def kernel(q_ref, o_ref):
        qv = q_ref[:]
        for kk in range(81):
            acc = jnp.sum(qv * float(kk + 1), axis=0)  # (P,) stand-in row
            o_ref[kk] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((88, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    _timeit(f"rowwr 81 single-row writes into (88,{P})", call, (q,), reps=16)


def probe_corr2():
    """Flattened-2D corr with per-kk single-row writes (fixed from round 1):
    the real contender — products + rolls + row writes, all in one kernel."""
    radius, stride, w = 4, 2, 128
    c = 32
    q = jnp.asarray(np.random.RandomState(0).rand(c, P), jnp.float32)
    m = jnp.asarray(np.random.RandomState(1).rand(c, P), jnp.float32)

    def kernel(q_ref, m_ref, o_ref):
        k = 2 * radius + 1
        qv = q_ref[:]
        mv = m_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) % w
        for dx in range(-radius, radius + 1):
            sh = dx * stride
            mask = ((col + sh >= 0) & (col + sh < w)).astype(jnp.float32)[0]
            for dy in range(-radius, radius + 1):
                shift = (dy * stride * w + sh) % P
                mm = pltpu.roll(mv, (-shift) % P, axis=1) if shift else mv
                kk = (dy + radius) * k + (dx + radius)
                o_ref[kk] = jnp.sum(qv * mm, axis=0) * mask

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((88, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    _timeit(f"corr2d 81 windows (C={c}, P={P}) + row writes", call, (q, m),
            reps=16)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    for name, fn in (
        ("tr88", lambda: probe_tr(88, "tr88")),
        ("tr32", lambda: probe_tr(32, "tr32")),
        ("mmstd", probe_mmstd),
        ("mm8", probe_mm8),
        ("rowwr", probe_rowwr),
        ("corr2", probe_corr2),
    ):
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}"[:500])
