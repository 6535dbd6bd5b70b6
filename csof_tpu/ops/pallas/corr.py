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
    tile_h: int, slab: int, w_logical: int,
):
    """One (batch, row-tile) grid step.

    q_ref:  (1, C, TH, W) VMEM block of the query (pipelined by pallas)
    m_hbm:  (B, C, Hrows, W) row-padded memory resident in HBM. The W axis
            carries NO halo: column shifts are lane-rolls + an output-column
            mask (out-of-range columns correlate against zero padding, i.e.
            the output is zero there). This removes both the old 2x lane-pad
            DMA waste at W=128 (144 -> 256) and the 81 lane-UNALIGNED VMEM
            slices (each paid a shift-network pass); now there are only
            K aligned rolls.
    o_ref:  (1, K^2, TH, W) output block (input dtype; f32 accumulation)
    m_vmem: (2, C, slab, W) double-buffered scratch, slab = TH + 2*pad
            rounded to the sublane tile. Grid steps run sequentially on the
            core, so step `lin` prefetches the slab for step `lin+1` while
            computing its own (bench: the serial DMA was ~25% of kernel
            time at SegFlow level-0 geometry).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    th, w = q_ref.shape[2], q_ref.shape[3]
    k = 2 * radius + 1
    lin = b * nt + i
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def dma(bb, ii, sl):
        return pltpu.make_async_copy(
            m_hbm.at[bb, :, pl.ds(ii * tile_h, slab), :],
            m_vmem.at[sl],
            sem.at[sl],
        )

    @pl.when(lin == 0)
    def _():
        dma(b, i, slot).start()

    # prefetch the successor grid step's slab (row-major order: i fastest)
    @pl.when(jnp.logical_and(lin + 1 < nb * nt, i + 1 < nt))
    def _():
        dma(b, i + 1, nslot).start()

    @pl.when(jnp.logical_and(lin + 1 < nb * nt, i + 1 == nt))
    def _():
        dma(b + 1, 0, nslot).start()

    dma(b, i, slot).wait()
    # f32 upcast happens HERE, in VMEM, after the (possibly bf16) DMA —
    # HBM/DMA traffic stays in the input dtype; Mosaic's lane rotate only
    # supports 32-bit element types ("Rotate with non-32-bit data")
    q = q_ref[0].astype(jnp.float32)
    m_all = m_vmem[slot].astype(jnp.float32)
    # w here is the lane-padded width (DMA slices must be 128-aligned on the
    # lane axis); the mask uses the LOGICAL width, so columns that roll in
    # wrapped or padded data are zeroed — identical to zero-padded shifts
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    for dx in range(-radius, radius + 1):
        sh = dx * stride
        # pltpu.roll requires a non-negative shift; a circular roll by -sh
        # equals one by (-sh) mod w
        rolled = pltpu.roll(m_all, (-sh) % w, axis=2) if sh % w else m_all
        mask = ((col + sh >= 0) & (col + sh < w_logical)).astype(jnp.float32)
        for dy in range(-radius, radius + 1):
            oy = (dy + radius) * stride
            m = rolled[:, oy : oy + th, :]
            kk = (dy + radius) * k + (dx + radius)
            acc = jnp.sum(q * m, axis=0)
            o_ref[0, kk] = (acc * (scale * mask)).astype(o_ref.dtype)


def _pick_tile_h(h: int, w: int, c: int, k2: int, pad: int, itemsize: int,
                 budget_mb: float = 10.0):
    """Largest row-tile whose q + m-scratch + out blocks fit the VMEM budget.

    The returned tile need NOT divide h: the caller pads the row axis to a
    tile multiple and slices the output back (a non-dividing tile previously
    left the trailing h % tile_h rows of the output unwritten)."""
    candidates = [th for th in (h, 256, 128, 64, 32, 16) if th <= h] or [h]
    for th in candidates:
        bytes_needed = itemsize * (
            2 * c * th * w  # q block (pipeline double-buffers)
            + 2 * c * _round_up(th + 2 * pad, 16) * w  # m scratch, 2 slots
            + 2 * k2 * th * w  # out block (pipeline double-buffers)
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
    query_cm: bool = False,
    out_cm: bool = False,
    memory_cm: bool = False,
) -> jnp.ndarray:
    """query/memory: (B, H, W, C) -> (B, H, W, (2r+1)^2), in the INPUT dtype.
    out_cm=True returns (B, (2r+1)^2, H, W) — the kernel's native layout,
    for consumers that can eat channel-major (SkipFuse split mode feeds it
    straight into an NCHW conv), skipping the output transpose glue.

    bf16 inputs stay bf16 through the transposes, DMA and VPU reads (the
    products are accumulated in f32) — on bf16 SegFlow activations this
    halves every byte the kernel moves vs the old always-f32 version, with
    no information loss (the activations were bf16 to begin with).

    query_cm=True: query arrives (B, C, H, W) — its transpose was hoisted
    by the caller (the glue around the kernel, not the kernel, dominates
    per-call cost; see local_correlation_volume)."""
    if query_cm:
        b, c, h, w = query.shape
        q_cm = query
    else:
        b, h, w, c = query.shape
        q_cm = jnp.moveaxis(query, -1, 1)  # (B, C, H, W)
    pad = radius * stride
    k2 = (2 * radius + 1) ** 2
    dtype = query.dtype
    # the scratch slabs and DMA are typed by the QUERY dtype; a mismatched
    # memory dtype would otherwise surface as an opaque Mosaic verification
    # error ("DMA source and target element type mismatch") at lowering
    memory = memory.astype(dtype)
    # channel-major: the lane dimension is the aligned W axis; K^2=81 on the
    # minor axis makes Mosaic blow up (81 is not lane-aligned), so the window
    # index is an untiled leading dim. memory_cm=True: the caller already
    # holds (B, C, H, W) memory (SkipFuse concat_cm shares one transpose
    # between the kernel and the channel-major fuse concat).
    m_cm = memory if memory_cm else jnp.moveaxis(memory, -1, 1)
    # lane axis padded to the 128 tile: Mosaic rejects DMA slices whose lane
    # extent is not 128-aligned (a 32-wide level-2 map is stored lane-padded
    # anyway; the roll+mask shift logic stays correct because the mask uses
    # the logical width)
    wpad = _round_up(w, 128)
    tile_h = _pick_tile_h(h, wpad, c, k2, pad, jnp.dtype(dtype).itemsize, budget_mb)
    # Pad the row axis to a tile multiple (tile_h need not divide h); the
    # extra rows are zeros and the output is sliced back to h below.
    hpad = _round_up(h, tile_h)
    if hpad != h or wpad != w:
        q_cm = jnp.pad(q_cm, ((0, 0), (0, 0), (0, hpad - h), (0, wpad - w)))
    # Row padding only (see _corr_tile_kernel: no column halo): pad rows so
    # every slab [i*TH, i*TH + slab) is in bounds, sublane-tile-aligned.
    slab = _round_up(tile_h + 2 * pad, 16)
    rows = (hpad // tile_h - 1) * tile_h + slab
    m_cm = jnp.pad(
        m_cm, ((0, 0), (0, 0), (pad, max(rows - h - pad, pad)), (0, wpad - w))
    )
    kernel = functools.partial(
        _corr_tile_kernel,
        radius=radius, stride=stride, scale=1.0 / math.sqrt(c),
        tile_h=tile_h, slab=slab, w_logical=w,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, k2, hpad, wpad), dtype),
        grid=(b, hpad // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, c, tile_h, wpad), lambda bb, ii: (bb, 0, ii, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded memory stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, k2, tile_h, wpad), lambda bb, ii: (bb, 0, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, slab, wpad), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(q_cm, m_cm)
    if hpad != h or wpad != w:
        out = out[:, :, :h, :w]
    return out if out_cm else jnp.moveaxis(out, 1, -1)


def _corr_bwd_tile_kernel(
    q_hbm, m_hbm, g_hbm, dq_ref, dm_ref, q_vmem, m_vmem, g_vmem, sems, *,
    radius: int, stride: int, scale: float, tile_h: int, slab: int,
    w_logical: int,
):
    """Backward of the local correlation for one (batch, row-tile) step.

    With zero-padded shifts d_kk = (dy, dx)*stride and the cotangent
    g[p, kk]:

      dq[p, c] = scale * sum_kk g[p, kk]        * m[p + d_kk, c]
      dm[p, c] = scale * sum_e  g[p + e, kk(-e)] * q[p + e, c]

    (the dm form substitutes e = -d_kk, legal because the window is
    symmetric) — i.e. BOTH gradients are roll+fma patterns over the same
    (2r+1)^2 window as the forward, with no scatter at all. The previous
    XLA backward materialized 81 dynamic slices + 81 scatter-adds in f32
    per level.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = dq_ref.shape[2]
    w = dq_ref.shape[3]
    k = 2 * radius + 1

    for src, dst, sem in ((q_hbm, q_vmem, 0), (m_hbm, m_vmem, 1), (g_hbm, g_vmem, 2)):
        pltpu.make_async_copy(
            src.at[b, :, pl.ds(i * tile_h, slab), :], dst, sems.at[sem]
        ).start()
    for src, dst, sem in ((q_hbm, q_vmem, 0), (m_hbm, m_vmem, 1), (g_hbm, g_vmem, 2)):
        pltpu.make_async_copy(
            src.at[b, :, pl.ds(i * tile_h, slab), :], dst, sems.at[sem]
        ).wait()

    pad = radius * stride
    q_all = q_vmem[...].astype(jnp.float32)
    m_all = m_vmem[...].astype(jnp.float32)
    g_all = g_vmem[...].astype(jnp.float32)
    g_center = g_all[:, pad : pad + th, :]
    c_dim = q_all.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    dq_acc = jnp.zeros((c_dim, th, w), jnp.float32)
    dm_acc = jnp.zeros((c_dim, th, w), jnp.float32)
    for dx in range(-radius, radius + 1):
        sh = dx * stride
        if sh % w:
            m_rolled = pltpu.roll(m_all, (-sh) % w, axis=2)
            q_rolled = pltpu.roll(q_all, (-sh) % w, axis=2)
            g_rolled = pltpu.roll(g_all, (-sh) % w, axis=2)
        else:
            m_rolled, q_rolled, g_rolled = m_all, q_all, g_all
        mask = ((col + sh >= 0) & (col + sh < w_logical)).astype(jnp.float32)
        for dy in range(-radius, radius + 1):
            oy = (dy + radius) * stride
            kk = (dy + radius) * k + (dx + radius)
            kkflip = (radius - dy) * k + (radius - dx)
            # dq: g at the tile center, m shifted by +d_kk
            dq_acc = dq_acc + (g_center[kk] * mask)[None] * m_rolled[:, oy : oy + th, :]
            # dm: g (flipped window channel) AND q both shifted by +e
            gq = (g_rolled[kkflip, oy : oy + th, :] * mask)[None]
            dm_acc = dm_acc + gq * q_rolled[:, oy : oy + th, :]
    dq_ref[0] = (dq_acc * scale).astype(dq_ref.dtype)
    dm_ref[0] = (dm_acc * scale).astype(dm_ref.dtype)


def _corr_bwd_dq_kernel(
    m_hbm, g_hbm, dq_ref, m_vmem, g_vmem, acc, sems, *,
    radius: int, stride: int, scale: float, tile_h: int, slab: int,
    w_logical: int,
):
    """dq for one (batch, row-tile) across a dx-minor grid axis.

    dq[p, c] = scale * sum_kk g[p, kk] * m[p + d_kk, c].  The first
    generation of this kernel unrolled all (2r+1) column shifts in one grid
    step and Mosaic kept every shift's rolled f32 slab live (120.9 MB of
    scoped VMEM stack wanted at C=128 vs the 16 MB limit).  Here each grid
    step handles ONE dx: the m/g slabs are DMA'd into persistent scratch at
    dx==0 and the f32 accumulator scratch carries across the dx steps (the
    TPU grid runs sequentially on the core), so the live set is one rolled
    slab + one accumulator regardless of radius."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)  # dx + radius, minor/fastest axis
    k = 2 * radius + 1
    th = dq_ref.shape[2]
    w = dq_ref.shape[3]
    pad = radius * stride

    @pl.when(j == 0)
    def _():
        pltpu.make_async_copy(
            m_hbm.at[b, :, pl.ds(i * tile_h, slab), :], m_vmem, sems.at[0]
        ).start()
        pltpu.make_async_copy(
            g_hbm.at[b, :, pl.ds(i * tile_h, slab), :], g_vmem, sems.at[1]
        ).start()
        pltpu.make_async_copy(
            m_hbm.at[b, :, pl.ds(i * tile_h, slab), :], m_vmem, sems.at[0]
        ).wait()
        pltpu.make_async_copy(
            g_hbm.at[b, :, pl.ds(i * tile_h, slab), :], g_vmem, sems.at[1]
        ).wait()
        acc[...] = jnp.zeros_like(acc)

    dx = j - radius
    sh = dx * stride
    m_all = m_vmem[...].astype(jnp.float32)
    # sh is a traced grid quantity here -> always a (dynamic-shift) roll
    m_rolled = pltpu.roll(m_all, (-sh) % w, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    mask = ((col + sh >= 0) & (col + sh < w_logical)).astype(jnp.float32)
    part = acc[...]
    for dy in range(-radius, radius + 1):
        oy = (dy + radius) * stride
        kk = (dy + radius) * k + j
        # g at the tile center (rows pad..pad+th of the slab), channel kk
        g_c = g_vmem[kk, pad : pad + th, :].astype(jnp.float32)
        part = part + (g_c * mask)[None] * m_rolled[:, oy : oy + th, :]
    acc[...] = part

    @pl.when(j == k - 1)
    def _():
        dq_ref[0] = (acc[...] * scale).astype(dq_ref.dtype)


def _corr_bwd_dm_kernel(
    q_hbm, g_hbm, dm_ref, q_vmem, g_vmem, acc, sems, *,
    radius: int, stride: int, scale: float, tile_h: int, slab: int,
    w_logical: int,
):
    """dm for one (batch, row-tile) across a dx-minor grid axis.

    dm[p, c] = scale * sum_e g[p + e, kk(-e)] * q[p + e, c] (e runs over
    the symmetric window, kk(-e) is the flipped window channel) — both g
    and q are shifted by the same +e, so each dx step rolls one q slab and
    the (2r+1)-channel strided slice of g it needs.  See _corr_bwd_dq_kernel
    for why dx lives on the grid."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    k = 2 * radius + 1
    th = dm_ref.shape[2]
    w = dm_ref.shape[3]

    @pl.when(j == 0)
    def _():
        pltpu.make_async_copy(
            q_hbm.at[b, :, pl.ds(i * tile_h, slab), :], q_vmem, sems.at[0]
        ).start()
        pltpu.make_async_copy(
            g_hbm.at[b, :, pl.ds(i * tile_h, slab), :], g_vmem, sems.at[1]
        ).start()
        pltpu.make_async_copy(
            q_hbm.at[b, :, pl.ds(i * tile_h, slab), :], q_vmem, sems.at[0]
        ).wait()
        pltpu.make_async_copy(
            g_hbm.at[b, :, pl.ds(i * tile_h, slab), :], g_vmem, sems.at[1]
        ).wait()
        acc[...] = jnp.zeros_like(acc)

    # dm[p] = scale * sum_d g[p + d, kk(-d)] * q[p + d]: shift +d paired
    # with the FLIPPED window channel kk(-d) = (radius-dy)*k + (radius-dx)
    # (identical pairing to the verified fused kernel; the window is
    # symmetric so summing over +d covers it)
    dx = j - radius
    sh = dx * stride
    q_all = q_vmem[...].astype(jnp.float32)
    # sh is a traced grid quantity here -> always a (dynamic-shift) roll
    q_rolled = pltpu.roll(q_all, (-sh) % w, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    mask = ((col + sh >= 0) & (col + sh < w_logical)).astype(jnp.float32)
    part = acc[...]
    for dy in range(-radius, radius + 1):
        oy = (dy + radius) * stride
        kkflip = (radius - dy) * k + (k - 1 - j)
        g_r = g_vmem[kkflip].astype(jnp.float32)
        g_r = pltpu.roll(g_r, (-sh) % w, axis=1)
        gq = (g_r[oy : oy + th, :] * mask)[None]
        part = part + gq * q_rolled[:, oy : oy + th, :]
    acc[...] = part

    @pl.when(j == k - 1)
    def _():
        dm_ref[0] = (acc[...] * scale).astype(dm_ref.dtype)


def _corr_bwd_pallas_v2(query, memory, g, radius, stride, interpret,
                        budget_mb: float = 10.0):
    """(B,H,W,C) q/m + (B,H,W,K^2) cotangent -> (dq, dm), input dtypes.

    Two pallas calls (dq, dm), each gridded (batch, row-tiles, dx) with the
    column shift on the MINOR grid axis and an f32 accumulator in scratch —
    bounded live set at any C (the fused one-step kernel wanted 120.9 MB of
    scoped VMEM at C=128; see _corr_bwd_dq_kernel)."""
    b, h, w, c = query.shape
    pad = radius * stride
    k = 2 * radius + 1
    k2 = k * k
    dtype = query.dtype
    q_cm = jnp.moveaxis(query, -1, 1)
    m_cm = jnp.moveaxis(memory, -1, 1)
    g_cm = jnp.moveaxis(g.astype(dtype), -1, 1)
    wpad = _round_up(w, 128)
    tile_h = _pick_tile_h(
        h, wpad, c + k2, c, pad, jnp.dtype(dtype).itemsize, budget_mb
    )
    hpad = _round_up(h, tile_h)
    slab = _round_up(tile_h + 2 * pad, 16)
    rows = (hpad // tile_h - 1) * tile_h + slab
    rpad = ((0, 0), (0, 0), (pad, max(rows - h - pad, pad)), (0, wpad - w))
    q_cm = jnp.pad(q_cm, rpad)
    m_cm = jnp.pad(m_cm, rpad)
    g_cm = jnp.pad(g_cm, rpad)
    grid = (b, hpad // tile_h, k)
    out_spec = pl.BlockSpec(
        (1, c, tile_h, wpad), lambda bb, ii, jj: (bb, 0, ii, 0),
        memory_space=pltpu.VMEM,
    )
    scratch = [
        pltpu.VMEM((c, slab, wpad), dtype),
        pltpu.VMEM((k2, slab, wpad), dtype),
        pltpu.VMEM((c, tile_h, wpad), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    common = dict(radius=radius, stride=stride, scale=1.0 / math.sqrt(c),
                  tile_h=tile_h, slab=slab, w_logical=w)
    dq = pl.pallas_call(
        functools.partial(_corr_bwd_dq_kernel, **common),
        out_shape=jax.ShapeDtypeStruct((b, c, hpad, wpad), dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(m_cm, g_cm)
    dm = pl.pallas_call(
        functools.partial(_corr_bwd_dm_kernel, **common),
        out_shape=jax.ShapeDtypeStruct((b, c, hpad, wpad), dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q_cm, g_cm)
    dq = jnp.moveaxis(dq[:, :, :h, :w], 1, -1)
    dm = jnp.moveaxis(dm[:, :, :h, :w], 1, -1)
    return dq, dm


def _corr_bwd_pallas(query, memory, g, radius, stride, interpret,
                     budget_mb: float = 10.0):
    """(B,H,W,C) q/m + (B,H,W,K^2) cotangent -> (dq, dm), input dtypes."""
    b, h, w, c = query.shape
    pad = radius * stride
    k2 = (2 * radius + 1) ** 2
    dtype = query.dtype
    q_cm = jnp.moveaxis(query, -1, 1)
    m_cm = jnp.moveaxis(memory, -1, 1)
    g_cm = jnp.moveaxis(g.astype(dtype), -1, 1)
    wpad = _round_up(w, 128)
    # reuse the forward tile picker with an effective channel count that
    # reflects the three slabs (C q + C m + K2 g) and two accumulators
    tile_h = _pick_tile_h(
        h, wpad, 2 * c + k2, c, pad, jnp.dtype(dtype).itemsize, budget_mb
    )
    hpad = _round_up(h, tile_h)
    slab = _round_up(tile_h + 2 * pad, 16)
    rows = (hpad // tile_h - 1) * tile_h + slab
    rpad = ((0, 0), (0, 0), (pad, max(rows - h - pad, pad)), (0, wpad - w))
    q_cm = jnp.pad(q_cm, rpad)
    m_cm = jnp.pad(m_cm, rpad)
    g_cm = jnp.pad(g_cm, rpad)
    kernel = functools.partial(
        _corr_bwd_tile_kernel,
        radius=radius, stride=stride, scale=1.0 / math.sqrt(c),
        tile_h=tile_h, slab=slab, w_logical=w,
    )
    dq, dm = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, c, hpad, wpad), dtype),
            jax.ShapeDtypeStruct((b, c, hpad, wpad), dtype),
        ),
        grid=(b, hpad // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=(
            pl.BlockSpec((1, c, tile_h, wpad), lambda bb, ii: (bb, 0, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tile_h, wpad), lambda bb, ii: (bb, 0, ii, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, slab, wpad), dtype),
            pltpu.VMEM((c, slab, wpad), dtype),
            pltpu.VMEM((k2, slab, wpad), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(q_cm, m_cm, g_cm)
    dq = jnp.moveaxis(dq[:, :, :h, :w], 1, -1)
    dm = jnp.moveaxis(dm[:, :, :h, :w], 1, -1)
    return dq, dm


@functools.lru_cache(maxsize=None)
def _make_corr_fn(radius: int, stride: int, interpret: bool, q_cm: bool = False,
                  out_cm: bool = False, m_cm: bool = False):
    """custom_vmap traces every positional argument, so the static kernel
    parameters are closed over here (one cached wrapper per config).

    The batched kernel carries a custom VJP (pallas_call has no JVP rule,
    so the kernel would otherwise be forward-only). The backward DEFAULTS
    to the dx-gridded v2 Pallas kernels (proven on-chip round 4: 13-17x
    the XLA shifted-slice backward per level, 87.6 -> 234.7 train f/s
    in-model); CSOF_CORR_BWD=jnp selects the XLA path, pallas_v1 the
    fused one-step kernel (VMEM-stack-OOMs at large C x K^2, kept for
    the record). CPU interpret-mode tests exercise v2 for correctness."""

    @jax.custom_vjp
    def batched(query, memory):
        return local_correlation_volume_pallas_batched(
            query, memory, radius, stride, interpret, query_cm=q_cm,
            out_cm=out_cm, memory_cm=m_cm,
        )

    def _fwd(query, memory):
        return batched(query, memory), (query, memory)

    def _bwd(res, g):
        query, memory = res
        if out_cm:
            # backward math is channels-last; the cotangent arrives in the
            # kernel's channel-major output layout
            g = jnp.moveaxis(g, 1, -1)
        import os

        impl = os.environ.get("CSOF_CORR_BWD")
        if impl not in ("jnp", "pallas", "pallas_v1"):
            # Default: the dx-gridded v2 Pallas backward. Proven on-chip in
            # round 4: 1.24/1.44/1.48 ms per fwd+bwd at the three SegFlow
            # level geometries vs 18.7/20.2/25.2 ms for the XLA
            # shifted-slice backward (13-17x), and in-model it lifted the
            # b=4 train step from 87.6 to 234.7 frames/s (2.7x,
            # tools/bench_corr_bwd.py + bench_segflow_train.py, sweep
            # r4b). CSOF_CORR_BWD=jnp is the escape hatch; pallas_v1 (the
            # fused one-step kernel) still VMEM-stack-OOMs at large C x K^2
            # (120.9 MB scoped stack vs the 16 MB limit) and stays opt-in
            # for the record.
            impl = "pallas"
        if q_cm:
            # backward math below is channels-last; the primal query (and
            # therefore dq) is channel-major when the caller hoisted the
            # transpose — convert in, convert the gradient back out
            query = jnp.moveaxis(query, 1, -1)
        if m_cm:
            # same for a channel-major memory (SkipFuse concat_cm)
            memory = jnp.moveaxis(memory, 1, -1)
        if impl == "pallas":
            dq, dm = _corr_bwd_pallas_v2(query, memory, g, radius, stride, interpret)
            return (
                jnp.moveaxis(dq, -1, 1) if q_cm else dq,
                jnp.moveaxis(dm, -1, 1) if m_cm else dm,
            )
        if impl == "pallas_v1":
            dq, dm = _corr_bwd_pallas(query, memory, g, radius, stride, interpret)
            return (
                jnp.moveaxis(dq, -1, 1) if q_cm else dq,
                jnp.moveaxis(dm, -1, 1) if m_cm else dm,
            )
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
        dm = dm_pad[:, pad : pad + h, pad : pad + w, :].astype(memory.dtype)
        dq = dq.astype(query.dtype)
        return (
            jnp.moveaxis(dq, -1, 1) if q_cm else dq,
            jnp.moveaxis(dm, -1, 1) if m_cm else dm,
        )

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
    interpret: bool = False, q_cm: bool = False, out_cm: bool = False,
    m_cm: bool = False,
) -> jnp.ndarray:
    """query/memory: (H, W, C) -> (H, W, (2r+1)^2). Under jax.vmap this
    dispatches to the batch-gridded kernel instead of letting vmap
    auto-batch the pallas_call. q_cm=True: query is (C, H, W); out_cm=True
    returns ((2r+1)^2, H, W); m_cm=True: memory is (C, H, W)."""
    return _make_corr_fn(
        int(radius), int(stride), bool(interpret), bool(q_cm), bool(out_cm),
        bool(m_cm),
    )(query, memory)
