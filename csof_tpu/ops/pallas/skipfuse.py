"""Pallas megakernel: corr + concat + fuse-conv + GroupNorm + LeakyReLU.

One kernel per (SegFlow level, sample) computing the ENTIRE SkipFuse
`concat_cm` chain (models/segflow.py SkipFuse; ref counterpart: the
per-scale CorrVolume + fuse conv at ref: nnunet/network_architecture/
SegFlowGaussian.py:255-269, 1374-1386):

    corr = local_correlation_volume(q, m, radius, stride)      # (2r+1)^2 ch
    y    = conv3x3(concat([q, m, corr], ch), W) + b            # F ch
    out  = leaky_relu(group_norm(y))

Motivation (docs/BENCHMARKS.md round 4): the serving step is bound by the
~75-90 us PER-OP floor of this backend x ~50 ops/step; the corr+fuse chain
is its largest op cluster (m-transpose, corr kernel, concat, conv,
affine+act per level x 3 levels). This kernel collapses the cluster to ONE
op per level and removes every intermediate HBM round trip (corr volume,
concat buffer).

Design (pinned by the tools/probe_fusemm*.py Mosaic probes, round 5):
- correlation stays CHANNEL-MAJOR — window index kk on the leading axis,
  per-kk single-row writes (measured free; lane/sublane ASSEMBLY of a
  channels-last corr is a measured catastrophe),
- the conv runs as ONE standard-orientation matmul per row-tile with the
  TAP-WIDENED output dim N = 9F (in-VMEM tap accumulation afterwards) —
  lhs-TRANSPOSED dot_general measured ~scalar-speed (0.09 TF/s), so the
  channel-major operands are bridged with explicit 2D transposes
  (measured 6.8 us per (88, 16640) f32 — cheap),
- all spatial handling is FLATTENED-2D (C, rows*W): dy/dx window shifts
  are lane-offset reads of a zero-haloed buffer with column masks (the
  value-level lax.dynamic_slice is unsupported in Mosaic; ref reads via
  pl.ds are used for the tile-dependent offsets),
- GroupNorm needs whole-sample statistics, so the grid runs
  (batch, 2 * n_tiles): tiles 0..n-1 compute conv outputs into a
  persistent VMEM scratch while accumulating f32 channel sums; tiles
  n..2n-1 apply the affine + LeakyReLU and emit the pipelined output
  blocks. Math matches models/blocks.py GroupNorm's bf16 fast path
  (f32 stat accumulation, bf16 affine apply) and leaky slope 0.01.

Forward/serving only: there is NO VJP (training keeps the corr kernel +
XLA conv path; `corr_fuse=fused_cm` is a param-compatible serving remap of
`concat`/`concat_cm` — see csof_tpu/inference/serving.py).
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


def _pick_tile(h: int, w: int) -> int:
    """Row-tile: ~2048 out-lanes per tile, dividing H, multiple of 8/w'ness
    not required (lane offsets handle it); small levels take the whole H.
    CSOF_FUSE_TILE overrides the lane target (VMEM/perf tuning knob)."""
    import os

    # W>=128 levels default to 1024 out-lanes/tile: the th=16 (2560-lane
    # X window) level-0 kernel reproducibly kills the remote compile
    # helper (exit 1, no diagnostic) while th=8 compiles and runs
    default = 1024 if w >= 128 else 2048
    target = int(os.environ.get("CSOF_FUSE_TILE", str(default)))
    th = max(1, min(h, target // w))
    while h % th:
        th -= 1
    return th


def _layout(h: int, w: int, th: int, radius: int, stride: int):
    """Solve the zero-halo / alignment layout.

    Mosaic requires DYNAMIC-start lane reads to be provably 128-aligned
    (the fused_b8 compile failed with "cannot statically prove that index
    in dimension 1 is a multiple of 128"), so the kernel reads ONE aligned
    slab per tile — base = tile*(th*w) [provable when th*w % 128 == 0]
    + a 128-aligned STATIC offset — and every window/tap access is a
    STATIC slice within that slab value (static unaligned reads are fine,
    probe round 4). Returns (pad_rows, slab_lo, off_q, slab_span, pall):
      pad_rows  — zero rows each side of the image in the (C, pall) buffer
      slab_lo   — static 128-aligned slab start relative to tile*(th*w)
      off_q     — static offset of the X window (rows tile*th-2 ...) in
                  the slab
      slab_span — static slab width covering X + the +-stride*(radius*w
                  + radius) window reach
    """
    smax = stride * (radius * w + radius)
    pt = (th + 4) * w
    pad_rows = stride * radius + 3
    while True:
        slab_lo = ((pad_rows - 2) * w - smax) // 128 * 128
        off_q = (pad_rows - 2) * w - slab_lo
        slab_span = _round_up(off_q + pt + smax, 128)
        pall = (h + 2 * pad_rows) * w
        if (
            slab_lo >= 0
            and (h - th) * w + slab_lo + slab_span <= pall
            and (pad_rows * w) % 128 == 0  # aligned DMA landing offset
        ):
            return pad_rows, slab_lo, off_q, slab_span, pall
        pad_rows += 1


def _fused_kernel(
    q_hbm, m_hbm, w_ref, cb_ref, gs_ref, gb_ref,  # inputs
    o_ref,  # output
    stage, q32, m32, corr, xbuf, ybuf, stats, sems,  # scratch
    *, c, h, w, f, radius, stride, th, n_tiles, pad_rows, kpad, groups,
    eps, slope, slab_lo, off_q, slab_span,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    hw = h * w
    pt = (th + 4) * w  # X-space lanes per tile (rows tile*th-2 .. tile*th+th+2)
    k = 2 * radius + 1
    scale = 1.0 / math.sqrt(c)
    dtype = o_ref.dtype
    f32 = jnp.float32

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        # zero once: halo rows of q32/m32 stay zero forever (only the
        # center is rewritten per sample); corr pad rows + xbuf pad lanes
        # stay zero so the (zero-weight) pad columns never see garbage
        q32[...] = jnp.zeros_like(q32)
        m32[...] = jnp.zeros_like(m32)
        corr[...] = jnp.zeros_like(corr)
        xbuf[...] = jnp.zeros_like(xbuf)

    @pl.when(i == 0)
    def _():
        # load this sample: DMA channel-major (C, H*W) into the staging
        # buffer, cast-place into the f32 zero-haloed window space
        stats[...] = jnp.zeros_like(stats)
        for src, dst in ((q_hbm, q32), (m_hbm, m32)):
            pltpu.make_async_copy(src.at[b], stage, sems.at[0]).start()
            pltpu.make_async_copy(src.at[b], stage, sems.at[0]).wait()
            dst[:, pad_rows * w : pad_rows * w + hw] = stage[...].astype(f32)

    @pl.when(i < n_tiles)
    def _():
        tile = i
        # ONE provably-128-aligned dynamic slab read per tile (Mosaic
        # rejects unaligned dynamic-start lane reads); everything below is
        # a STATIC slice of the slab values. X local row 0 = image row
        # tile*th - 2 lives at static offset off_q within the slab.
        base = pl.multiple_of(tile * (th * w), 128) + slab_lo
        qslab = q32[:, pl.ds(base, slab_span)]
        mslab = m32[:, pl.ds(base, slab_span)]
        qv = qslab[:, off_q : off_q + pt]  # (C, pt) f32, zero off-image
        col = jax.lax.broadcasted_iota(jnp.int32, (1, pt), 1) % w
        for dx in range(-radius, radius + 1):
            sh = dx * stride
            mask = ((col + sh >= 0) & (col + sh < w)).astype(f32)
            for dy in range(-radius, radius + 1):
                o_ = off_q + stride * dy * w + sh
                mm = mslab[:, o_ : o_ + pt]
                acc = jnp.sum(qv * mm, axis=0, keepdims=True) * (scale * mask)
                # round through the model dtype exactly as the shipped corr
                # kernel does (the conv consumes bf16 corr values)
                acc = acc.astype(dtype).astype(f32)
                kk = (dy + radius) * k + (dx + radius)
                corr[kk] = acc[0]
        tw0 = pl.multiple_of(tile * (th * w), 128)

        # channels-last X via explicit 2D transposes (probe: cheap)
        xbuf[:, 0:c] = jnp.transpose(qv).astype(dtype)
        xbuf[:, c : 2 * c] = jnp.transpose(
            mslab[:, off_q : off_q + pt]
        ).astype(dtype)
        xbuf[:, 2 * c : 2 * c + corr.shape[0]] = jnp.transpose(corr[...]).astype(dtype)

        # fuse conv: one tap-widened matmul + 9 shifted adds
        wide = jnp.dot(xbuf[...], w_ref[...], preferred_element_type=f32)
        colo = jax.lax.broadcasted_iota(jnp.int32, (th * w, 1), 0) % w
        y = jnp.zeros((th * w, f), f32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                pp = (2 + dy) * w + dx
                j = ((dy + 1) * 3 + (dx + 1)) * f
                term = wide[pp : pp + th * w, j : j + f]
                if dx:
                    m_ = ((colo + dx >= 0) & (colo + dx < w)).astype(f32)
                    term = term * m_
                y = y + term
        # bf16 rounding point + bias match _NCHWConv (conv -> dtype, + bias)
        y_dt = y.astype(dtype) + cb_ref[0, :].astype(dtype)
        ybuf[pl.ds(tw0, th * w), :] = y_dt
        yf = y_dt.astype(f32)
        stats[0:1, 0:f] = stats[0:1, 0:f] + jnp.sum(yf, axis=0, keepdims=True)
        stats[1:2, 0:f] = stats[1:2, 0:f] + jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(i == n_tiles)
    def _():
        # GroupNorm affine from the accumulated f32 stats — the exact math
        # of models/blocks.py GroupNorm's bf16 fast path. The group
        # combine runs as tiny indicator matmuls (Mosaic rejects the
        # (1, F) -> (groups, F/groups) shape cast: "unsupported shape
        # cast" on-chip); summing cpg channel entries then dividing is
        # bit-identical to jnp.mean over the reshaped axis.
        cpg = f // groups
        mean_c = stats[0:1, 0:f] / hw  # (1, F)
        m2_c = stats[1:2, 0:f] / hw
        gi = jax.lax.broadcasted_iota(jnp.int32, (f, groups), 0) // cpg
        gj = jax.lax.broadcasted_iota(jnp.int32, (f, groups), 1)
        gsel = (gi == gj).astype(f32)  # (F, groups) channel->group indicator
        mean_g = jnp.dot(mean_c, gsel, preferred_element_type=f32) / cpg
        m2_g = jnp.dot(m2_c, gsel, preferred_element_type=f32) / cpg
        inv = jax.lax.rsqrt(jnp.maximum(m2_g - mean_g * mean_g, 0.0) + eps)
        gselt = jnp.transpose(gsel)  # (groups, F) group->channel broadcast
        inv_c = jnp.dot(inv, gselt, preferred_element_type=f32)  # (1, F)
        meanb = jnp.dot(mean_g, gselt, preferred_element_type=f32)
        a = gs_ref[0:1, :] * inv_c
        stats[2:3, 0:f] = a
        stats[3:4, 0:f] = gb_ref[0:1, :] - meanb * a

    @pl.when(i >= n_tiles)
    def _():
        j0 = pl.multiple_of((i - n_tiles) * (th * w), 128)
        yt = ybuf[pl.ds(j0, th * w), :]
        a = stats[2:3, 0:f].astype(dtype)
        bb = stats[3:4, 0:f].astype(dtype)
        out = yt * a + bb
        # predicate in f32: Mosaic rejects bf16 cmpf ("Target does not
        # support this comparison"); the VALUES stay bf16 as in the model
        pred = out.astype(f32) >= 0
        o_ref[0] = jnp.where(pred, out, jnp.asarray(slope, dtype) * out)


def fused_skip_fuse_batched(
    q_cm: jnp.ndarray,  # (B, C, H, W) channel-major query skips
    m_cm: jnp.ndarray,  # (B, C, H, W) channel-major memory skips
    w: jnp.ndarray,  # (3, 3, 2C + (2r+1)^2, F) f32 conv kernel
    b: jnp.ndarray,  # (F,) conv bias
    gn_scale: jnp.ndarray,  # (F,) GroupNorm scale
    gn_bias: jnp.ndarray,  # (F,) GroupNorm bias
    radius: int = 4,
    stride: int = 1,
    num_groups: int = 8,
    eps: float = 1e-5,
    negative_slope: float = 0.01,
    interpret: bool = False,
):
    """Returns out (B, H, W, F) in the input dtype."""
    bsz, c, h, wd = q_cm.shape
    k2 = (2 * radius + 1) ** 2
    f = w.shape[-1]
    assert w.shape == (3, 3, 2 * c + k2, f), (w.shape, c, k2, f)
    dtype = q_cm.dtype
    groups = min(num_groups, f)
    while f % groups:
        groups -= 1

    hw = h * wd
    th = _pick_tile(h, wd)
    n_tiles = h // th
    if not interpret:
        # Mosaic alignment provability needs tile*(th*w) % 128 == 0 (see
        # _layout); every SegFlow level geometry satisfies this
        assert (th * wd) % 128 == 0, (
            f"fused_cm needs th*W % 128 == 0, got th={th} W={wd}"
        )
    pad_rows, slab_lo, off_q, slab_span, pall = _layout(
        h, wd, th, radius, stride
    )
    pt = (th + 4) * wd
    k2pad = _round_up(k2, 8)  # corr rows padded to a sublane tile
    kpad = _round_up(2 * c + k2pad, 128)

    # tap-widened weights: wmat[kc, ((dy)*3 + dx)*F + f] = w[dy, dx, kc', f]
    # with the corr channel block re-based at 2C..2C+k2 and zero pad rows
    wt = jnp.moveaxis(w.astype(jnp.float32), 2, 0).reshape(2 * c + k2, 9 * f)
    wmat = jnp.zeros((kpad, 9 * f), jnp.float32)
    wmat = wmat.at[0 : 2 * c].set(wt[0 : 2 * c])
    wmat = wmat.at[2 * c : 2 * c + k2].set(wt[2 * c :])
    wmat = wmat.astype(dtype)

    kernel = functools.partial(
        _fused_kernel,
        c=c, h=h, w=wd, f=f, radius=radius, stride=stride, th=th,
        n_tiles=n_tiles, pad_rows=pad_rows, kpad=kpad, groups=groups,
        eps=eps, slope=negative_slope, slab_lo=slab_lo, off_q=off_q,
        slab_span=slab_span,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, hw, f), dtype),
        grid=(bsz, 2 * n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q (B, C, HW) in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # m (B, C, HW) in HBM
            pl.BlockSpec((kpad, 9 * f), lambda bb_, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb_, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb_, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb_, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th * wd, f),
            lambda bb_, ii: (bb_, jnp.maximum(ii - n_tiles, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((c, hw), dtype),  # stage (DMA landing)
            pltpu.VMEM((c, pall), jnp.float32),  # q32
            pltpu.VMEM((c, pall), jnp.float32),  # m32
            pltpu.VMEM((k2pad, pt), jnp.float32),  # corr rows (bf16-rounded)
            pltpu.VMEM((pt, kpad), dtype),  # xbuf (channels-last concat)
            pltpu.VMEM((hw, f), dtype),  # ybuf (pre-norm conv out)
            pltpu.VMEM((4, _round_up(f, 128)), jnp.float32),  # stats + affine
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(
        q_cm.reshape(bsz, c, hw),
        m_cm.astype(dtype).reshape(bsz, c, hw),
        wmat, b.astype(jnp.float32).reshape(1, f),
        gn_scale.astype(jnp.float32).reshape(1, f),
        gn_bias.astype(jnp.float32).reshape(1, f),
    )
    return out.reshape(bsz, h, wd, f)


@functools.lru_cache(maxsize=None)
def _make_fused_fn(radius: int, stride: int, num_groups: int, interpret: bool):
    """custom_vmap wrapper (one cached instance per static config): vmap
    folds into the kernel's batch grid axis instead of auto-batching the
    pallas_call (same pattern as ops/pallas/corr.py)."""

    @jax.custom_batching.custom_vmap
    def fused(q_cm, m_cm, w, b, gs, gb):
        out = fused_skip_fuse_batched(
            q_cm[None], m_cm[None], w, b, gs, gb,
            radius=radius, stride=stride, num_groups=num_groups,
            interpret=interpret,
        )
        return out[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, q_cm, m_cm, w, b, gs, gb):
        qb, mb = in_batched[0], in_batched[1]
        assert not any(in_batched[2:]), "params must be broadcast, not batched"
        if not qb:
            q_cm = jnp.broadcast_to(q_cm[None], (axis_size, *q_cm.shape))
        if not mb:
            m_cm = jnp.broadcast_to(m_cm[None], (axis_size, *m_cm.shape))
        out = fused_skip_fuse_batched(
            q_cm, m_cm, w, b, gs, gb,
            radius=radius, stride=stride, num_groups=num_groups,
            interpret=interpret,
        )
        return out, True

    return fused


def fused_skip_fuse(
    q_cm, m_cm, w, b, gn_scale, gn_bias, radius=4, stride=1, num_groups=8,
    interpret=False,
):
    """Single-sample entry: q_cm/m_cm (C, H, W) -> out (H, W, F). Under
    jax.vmap this dispatches to the batch grid. The sim/visualizer map is
    NOT produced here — SegFlowStep computes it via the regular corr path
    only when the intermediates collection is mutable."""
    return _make_fused_fn(int(radius), int(stride), int(num_groups),
                          bool(interpret))(q_cm, m_cm, w, b, gn_scale, gn_bias)
