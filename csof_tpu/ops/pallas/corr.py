"""Pallas kernel: local correlation volume.

out[h, w, k] = <query[h, w, :], memory[h + s*dy, w + s*dx, :]> / sqrt(C)

The jnp reference (csof_tpu.ops.correlation.local_correlation_volume) emits
(2r+1)^2 dynamic-slices of the padded memory tensor — each a separate HBM
read. Here query and the haloed memory block are loaded into VMEM ONCE and
all (2r+1)^2 shifted products run on the VPU from VMEM (static slices), with
the channel reduction feeding one output block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(q_ref, m_ref, o_ref, *, radius: int, stride: int, scale: float):
    """Channel-major layout: q/m are (C, H, W[pad]) so the lane dimension is
    the aligned W axis; output is (K^2, H, W) with the window index as an
    untiled leading dim (a (H, W, 81) minor-dim layout makes the Mosaic
    compiler blow up — 81 is not lane-aligned)."""
    c, h, w = q_ref.shape
    k = 2 * radius + 1
    q = q_ref[:]
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            oy = (dy + radius) * stride
            ox = (dx + radius) * stride
            m = m_ref[:, oy : oy + h, ox : ox + w]
            kk = (dy + radius) * k + (dx + radius)
            o_ref[kk] = jnp.sum(q * m, axis=0) * scale


def local_correlation_volume_pallas(
    query: jnp.ndarray,
    memory: jnp.ndarray,
    radius: int = 4,
    stride: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """query/memory: (H, W, C) -> (H, W, (2r+1)^2). Single-block kernel —
    appropriate for the SegFlow skip levels (<= ~128x128x128 features)."""
    h, w, c = query.shape
    pad = radius * stride
    k2 = (2 * radius + 1) ** 2
    q_cm = jnp.moveaxis(query.astype(jnp.float32), -1, 0)  # (C, H, W)
    m_cm = jnp.moveaxis(memory.astype(jnp.float32), -1, 0)
    m_cm = jnp.pad(m_cm, ((0, 0), (pad, pad), (pad, pad)))
    kernel = functools.partial(
        _corr_kernel, radius=radius, stride=stride, scale=1.0 / math.sqrt(c)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k2, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q_cm, m_cm)
    return jnp.moveaxis(out, 0, -1)
