"""On-chip probes for the corr+fuse megakernel design (round 5).

The megakernel plan (docs/ROADMAP.md round-5 critical path) flattens each
SegFlow level to 2D (C, H*W) inside one Pallas kernel: corr = roll+mask
products with a SUBLANE reduction, concat = sublane-row writes into a
(C_cat, P) buffer, fuse conv = lhs-TRANSPOSED matmuls (contract dim 0)
with a tap-widened N=9F output combined in VMEM. Three Mosaic unknowns
gate the design; each gets its own kernel probe at level-0 geometry:

  mm    — dot_general((K, P), (K, N)) contracting dim 0 (lhs-T matmul)
  asm   — building (8, P) sublane tiles from 8 (1, P) rows + tile store
  corr2 — flattened-2D corr: per-kk lane slice/roll + f32 product +
          sublane reduce over C, vs the shipped 3D kernel's known cost

Usage: python tools/probe_fusemm.py [mm|asm|corr2|all]   (runs on the chip)
Timing: fetch-synced state threading (tools/_timing.py; block_until_ready
is unreliable on this backend).
"""

from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import time_state

# level-0-ish geometry: C_cat = 32 q + 32 m + 81 corr -> 152 padded rows,
# P = a 1344-lane chunk (the matmul chunk), N = 9 taps * 32 = 288 -> 384
K, P, N = 152, 1344, 384
CORR_C, CORR_P = 32, 18688  # (C, (128+18)*128) flattened level-0 slab


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def probe_mm():
    x = jnp.asarray(np.random.RandomState(0).rand(K, P), jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).rand(K, N), jnp.bfloat16)

    call = pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(x, w, acc):
        o = call(x, w)
        return x * (1 + 2e-7), w, acc + o[0, 0]

    dt = time_state(step, (x, w, jnp.float32(0.0)), reps=32)
    flops = 2 * K * P * N
    print(f"mm lhs-T ({K}x{P})x({K}x{N}): {dt*1e6:.1f} us/call "
          f"-> {flops/dt/1e12:.2f} TF/s")


def _asm_kernel(rows_ref, o_ref):
    # 11 groups of 8: build each (8, P) tile from 8 (1, P) rows, store once
    for g in range(11):
        tile = jnp.concatenate(
            [rows_ref[(8 * g + j) % 81][None] for j in range(8)], axis=0
        )
        o_ref[8 * g : 8 * g + 8] = tile


def probe_asm():
    rows = jnp.asarray(np.random.RandomState(0).rand(81, P), jnp.float32)
    call = pl.pallas_call(
        _asm_kernel,
        out_shape=jax.ShapeDtypeStruct((88, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(rows, acc):
        o = call(rows)
        return rows * (1 + 2e-7), acc + o[0, 0]

    dt = time_state(step, (rows, jnp.float32(0.0)), reps=32)
    print(f"asm 81 rows -> 11 (8,{P}) tiles: {dt*1e6:.1f} us/call")


def _corr2_kernel(q_ref, m_ref, o_ref, *, radius, stride, w):
    """Flattened-2D corr: q (C, P) f32, m (C, Pm) f32 (Pm = P + 2*pad*W
    halo lanes). For each kk: lane-slice m at (dy+pad)*W (ALIGNED when
    W%128==0), lane-roll by dx*stride, product, sublane-reduce -> (1, P)."""
    k = 2 * radius + 1
    q = q_ref[:]
    p = q.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) % w
    for dx in range(-radius, radius + 1):
        sh = dx * stride
        mask = ((col + sh >= 0) & (col + sh < w)).astype(jnp.float32)
        for dy in range(-radius, radius + 1):
            off = (dy + radius) * stride * w
            m = m_ref[:, pl.ds(off, p)]
            if sh:
                m = pltpu.roll(m, (-sh) % p, axis=1)
            kk = (dy + radius) * k + (dx + radius)
            acc = jnp.sum(q * m, axis=0, keepdims=True)  # sublane reduce
            o_ref[kk] = acc * mask


def probe_corr2():
    radius, stride, w = 4, 2, 128
    pad = radius * stride
    pm = CORR_P + 2 * pad * w
    q = jnp.asarray(np.random.RandomState(0).rand(CORR_C, CORR_P), jnp.float32)
    m = jnp.asarray(np.random.RandomState(1).rand(CORR_C, pm), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_corr2_kernel, radius=radius, stride=stride, w=w),
        out_shape=jax.ShapeDtypeStruct((88, CORR_P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(q, m, acc):
        o = call(q, m)
        return q * (1 + 2e-7), m, acc + o[0, 0]

    dt = time_state(step, (q, m, jnp.float32(0.0)), reps=16)
    mb = 81 * 2 * CORR_C * CORR_P * 4 / 1e6
    print(f"corr2 flattened (C={CORR_C}, P={CORR_P}) 81 windows: "
          f"{dt*1e6:.1f} us/call ({mb:.0f} MB products -> "
          f"{mb/1e3/dt:.2f} TB/s VPU)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    if which in ("mm", "all"):
        probe_mm()
    if which in ("asm", "all"):
        probe_asm()
    if which in ("corr2", "all"):
        probe_corr2()
