"""Pallas kernel: local correlation volume.

out[b, h, w, k] = <query[b, h, w, :], memory[b, h + s*dy, w + s*dx, :]> / sqrt(C)

The jnp reference (csof_tpu.ops.correlation.local_correlation_volume) emits
(2r+1)^2 dynamic-slices of the padded memory tensor — each a separate HBM
read. Here query and the haloed memory block are loaded into VMEM ONCE and
all (2r+1)^2 shifted products run on the VPU from VMEM (static slices), with
the channel reduction feeding one output block.

Grid-tiled + batched: the grid runs over (batch, row-tiles), so the kernel
handles arbitrary batch sizes and large feature maps (Lib geometry, 384²)
without exceeding VMEM. The padded memory tensor stays in HBM (`pl.ANY`) and
each grid step DMAs its haloed row slab into a VMEM scratch buffer.

The single-sample entry point carries a `jax.custom_batching.custom_vmap`
rule that folds vmap into the kernel's batch grid axis instead of letting
vmap auto-batch the pallas_call (auto-batching pallas-inside-vmap(scan) hung
this environment's remote Mosaic compile service — see docs/BENCHMARKS.md).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corr_tile_kernel(
    q_ref, m_hbm, o_ref, m_vmem, sem, *, radius: int, stride: int, scale: float,
    tile_h: int, slab: int,
):
    """One (batch, row-tile) grid step.

    q_ref:  (1, C, TH, W) VMEM block of the query
    m_hbm:  (B, C, Hpad, Wpad) padded memory resident in HBM — Wpad is
            lane-aligned (128) and Hpad covers every slab, because Mosaic
            requires DMA slices to be tiling-aligned on the minor dims
            (a (…, 40) lane slice is rejected: "must be aligned to (128)")
    o_ref:  (1, K^2, TH, W) output block
    m_vmem: (C, slab, Wpad) scratch; slab = round_up(TH + 2*pad, 8)
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    th, w = q_ref.shape[2], q_ref.shape[3]
    k = 2 * radius + 1
    # DMA the haloed row slab for this tile: rows [i*TH, i*TH + slab);
    # full (aligned) lane width, sublane-aligned row count
    dma = pltpu.make_async_copy(
        m_hbm.at[b, :, pl.ds(i * tile_h, slab), :],
        m_vmem,
        sem,
    )
    dma.start()
    dma.wait()
    q = q_ref[0]
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            oy = (dy + radius) * stride
            ox = (dx + radius) * stride
            m = m_vmem[:, oy : oy + th, ox : ox + w]
            kk = (dy + radius) * k + (dx + radius)
            o_ref[0, kk] = jnp.sum(q * m, axis=0) * scale


def _pick_tile_h(h: int, w: int, c: int, k2: int, pad: int, budget_mb: float = 10.0):
    """Largest row-tile whose q + m-scratch + out blocks fit the VMEM budget.

    The returned tile need NOT divide h: the caller pads the row axis to a
    tile multiple and slices the output back (a non-dividing tile previously
    left the trailing h % tile_h rows of the output unwritten)."""
    candidates = [th for th in (h, 256, 128, 64, 32, 16, 8) if th <= h] or [h]
    for th in candidates:
        bytes_needed = 4 * (
            c * th * w  # q block
            + c * _round_up(th + 2 * pad, 8) * _round_up(w + 2 * pad, 128)  # m scratch
            + k2 * th * w  # out block
        )
        if bytes_needed <= budget_mb * 1024 * 1024:
            return th
    return candidates[-1]


def local_correlation_volume_pallas_batched(
    query: jnp.ndarray,
    memory: jnp.ndarray,
    radius: int = 4,
    stride: int = 1,
    interpret: bool = False,
    budget_mb: float = 10.0,
) -> jnp.ndarray:
    """query/memory: (B, H, W, C) -> (B, H, W, (2r+1)^2)."""
    b, h, w, c = query.shape
    pad = radius * stride
    k2 = (2 * radius + 1) ** 2
    # channel-major: the lane dimension is the aligned W axis; K^2=81 on the
    # minor axis makes Mosaic blow up (81 is not lane-aligned), so the window
    # index is an untiled leading dim
    q_cm = jnp.moveaxis(query.astype(jnp.float32), -1, 1)  # (B, C, H, W)
    m_cm = jnp.moveaxis(memory.astype(jnp.float32), -1, 1)
    tile_h = _pick_tile_h(h, w, c, k2, pad, budget_mb)
    # Pad the row axis to a tile multiple (tile_h need not divide h); the
    # extra rows are zeros and the output is sliced back to h below.
    hpad = _round_up(h, tile_h)
    if hpad != h:
        q_cm = jnp.pad(q_cm, ((0, 0), (0, 0), (0, hpad - h), (0, 0)))
    # DMA-alignment padding (see _corr_tile_kernel): lane axis to a 128
    # multiple, rows so that every slab [i*TH, i*TH + slab) is in bounds
    slab = _round_up(tile_h + 2 * pad, 8)
    wpad = _round_up(w + 2 * pad, 128)
    rows = (hpad // tile_h - 1) * tile_h + slab
    m_cm = jnp.pad(
        m_cm,
        ((0, 0), (0, 0), (pad, max(rows - h - pad, pad)), (pad, wpad - w - pad)),
    )
    kernel = functools.partial(
        _corr_tile_kernel,
        radius=radius, stride=stride, scale=1.0 / math.sqrt(c),
        tile_h=tile_h, slab=slab,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, k2, hpad, w), jnp.float32),
        grid=(b, hpad // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, c, tile_h, w), lambda bb, ii: (bb, 0, ii, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded memory stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, k2, tile_h, w), lambda bb, ii: (bb, 0, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((c, slab, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(q_cm, m_cm)
    if hpad != h:
        out = out[:, :, :h, :]
    return jnp.moveaxis(out, 1, -1)


@functools.lru_cache(maxsize=None)
def _make_corr_fn(radius: int, stride: int, interpret: bool):
    """custom_vmap traces every positional argument, so the static kernel
    parameters are closed over here (one cached wrapper per config).

    The batched kernel carries a custom VJP (pallas_call has no JVP rule,
    so the kernel would otherwise be forward-only): the backward runs as
    (2r+1)^2 static shifted slices / slice-adds in XLA — exactly the work
    autodiff emits for the jnp forward, so pallas-fwd + XLA-bwd strictly
    dominates the all-jnp training path."""

    @jax.custom_vjp
    def batched(query, memory):
        return local_correlation_volume_pallas_batched(
            query, memory, radius, stride, interpret
        )

    def _fwd(query, memory):
        return batched(query, memory), (query, memory)

    def _bwd(res, g):
        query, memory = res
        b, h, w, c = query.shape
        pad = radius * stride
        scale = 1.0 / math.sqrt(c)
        g = g.astype(jnp.float32)
        qf = query.astype(jnp.float32)
        m_pad = jnp.pad(
            memory.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad), (0, 0))
        )
        dq = jnp.zeros((b, h, w, c), jnp.float32)
        dm_pad = jnp.zeros_like(m_pad)
        i = 0
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                oy, ox = dy * stride + pad, dx * stride + pad
                gk = g[..., i][..., None] * scale  # (B, H, W, 1)
                shifted = jax.lax.dynamic_slice(m_pad, (0, oy, ox, 0), (b, h, w, c))
                dq = dq + gk * shifted
                dm_pad = dm_pad.at[:, oy : oy + h, ox : ox + w, :].add(gk * qf)
                i += 1
        dm = dm_pad[:, pad : pad + h, pad : pad + w, :]
        return dq.astype(query.dtype), dm.astype(memory.dtype)

    batched.defvjp(_fwd, _bwd)

    @jax.custom_batching.custom_vmap
    def corr(query, memory):
        return batched(query[None], memory[None])[0]

    @corr.def_vmap
    def _rule(axis_size, in_batched, query, memory):
        qb, mb = in_batched
        if not qb:
            query = jnp.broadcast_to(query[None], (axis_size, *query.shape))
        if not mb:
            memory = jnp.broadcast_to(memory[None], (axis_size, *memory.shape))
        return batched(query, memory), True

    return corr


def local_correlation_volume_pallas(
    query: jnp.ndarray, memory: jnp.ndarray, radius: int = 4, stride: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """query/memory: (H, W, C) -> (H, W, (2r+1)^2). Under jax.vmap this
    dispatches to the batch-gridded kernel instead of letting vmap
    auto-batch the pallas_call."""
    return _make_corr_fn(int(radius), int(stride), bool(interpret))(query, memory)
