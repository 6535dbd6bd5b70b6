"""Pallas kernel: stride-1 3x3 conv with tap-widened MXU output lanes.

Why: XLA lowers a 3x3 conv to an implicit matmul with contraction K*K*Cin
and output dim Cout. At the 3D-fullres channel counts (Cin=Cout=32) BOTH
matmul dims are fractional MXU tiles (K=288, N=32 -> 0.25 lane occupancy),
the measured ~29 TF/s "C=32 conv plateau" (docs/BENCHMARKS.md). Every
XLA-level reformulation tried (shift-pack r3, tap-sum r4) pays an HBM round
trip for the widened intermediate and loses.

This kernel widens IN VMEM: per row-tile it builds the H-only im2col
(K = 3*Cin on lanes), runs ONE matmul with N = 3*Cout output lanes
(balanced (96, 96) tiles at C=32 -> 0.56 of peak vs 0.19 native), then does
the 3 column-tap shifted adds on the f32 accumulator BEFORE anything is
stored. HBM traffic is exactly input + output, both in the model dtype.

    y[(i,j), (b,co)] = sum_{a,c} x[i+a-1, j, c] * w[a, b, c, co]   # MXU
    out[i, j, co]    = sum_b y[i, j+b-1, (b,co)]                   # VMEM adds

Layout (v2, channel-major): rows ride the grid; each (batch, row-tile)
step DMAs a haloed (Ci, slab, Wp) slab with the W axis lane-padded to 128.
v1 used a channels-last merged (row, W*C) layout to keep DMAs packed, but
its in-kernel lane-SPLITTING reshape (slab, W*C) -> (slab, W, C) is an
"unsupported shape cast" on this backend's Mosaic, and a direct 32-lane
DMA is rejected too (tools/probe_mosaic.py records the legality of every
candidate op). The channel-major form needs neither; its cost is the XLA
transpose on either side of the call (~2x input/output HBM traffic) and
the Wp lane pad for W % 128 != 0.

The backward-input pass is the SAME kernel with the spatially-flipped,
io-transposed weights; dL/dw stays on XLA (its (3,3,ci,co)-shaped output
is a different, reduction-bound matmul that XLA already handles at the
plateau rate).

ref: replaces the hot conv path of the reference's 3D stages
(ref: nnunet/network_architecture/generic_UNet.py conv blocks) via
models/blocks.py Conv3dVia2D — identical math and params.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _conv_cols_kernel(w2_ref, x_hbm, o_ref, x_vmem, sem, *, tile_h: int,
                      slab: int, wp: int, w_log: int, ci: int, co: int):
    """One (batch, row-tile) grid step, CHANNEL-MAJOR layout.

    w2_ref: (3*co, 3*ci) VMEM — w transposed to [(b,co), (a,c)]
    x_hbm:  (B, Ci, rows, Wp) row-padded channel-major input in HBM
    o_ref:  (1, co, tile_h, Wp) output block
    x_vmem: (2, Ci, slab, Wp) double-buffered scratch; step `lin`
            prefetches the slab for step `lin+1` (corr-kernel pattern).

    Mosaic legality (tools/probe_mosaic.py, measured on this backend):
    lane-splitting reshapes like (slab, W*C) -> (slab, W, C) are REJECTED
    ("unsupported shape cast"), as are DMAs with a 32-wide lane dim — which
    killed the first, channels-last version of this kernel on-chip. The
    channel-major form needs neither: the im2col is a sublane shift+concat
    on the MAJOR axis, the matmul is a rank-3 dot_general (legal), and the
    column taps are lane rolls + masks exactly like the corr kernel.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    lin = b * nt + i
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def dma(bb, ii, sl):
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, pl.ds(ii * tile_h, slab), :],
            x_vmem.at[sl],
            sem.at[sl],
        )

    @pl.when(lin == 0)
    def _():
        dma(b, i, slot).start()

    @pl.when(jnp.logical_and(lin + 1 < nb * nt, i + 1 < nt))
    def _():
        dma(b, i + 1, nslot).start()

    @pl.when(jnp.logical_and(lin + 1 < nb * nt, i + 1 == nt))
    def _():
        dma(b + 1, 0, nslot).start()

    dma(b, i, slot).wait()
    x = x_vmem[slot]  # (Ci, slab, Wp)
    # H-only im2col on the MAJOR axis: row r of tap a is padded-input row
    # (i*tile_h + r + a), i.e. logical row (i*tile_h + r + a - 1). Flatten
    # (TH, Wp) into ONE lane axis (128-aligned merge, probe-legal) so the
    # whole tile is a single 2D MXU matmul — the rank-3 dot_general form
    # measured only 7.1 TF/s on-chip (it lowers per-row).
    xcol = jnp.concatenate([x[:, a : a + tile_h, :] for a in range(3)], axis=0)
    xcol = xcol.reshape(3 * ci, tile_h * wp)
    # ONE tap-widened matmul: (3co, 3ci) x (3ci, TH*Wp) -> (3co, TH*Wp)
    y = jax.lax.dot_general(
        w2_ref[...], xcol,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # column taps: out[co, r, j] = sum_b y[(b,co), r, j+b-1] — rolls on the
    # merged (r, j) lane axis (f32, Mosaic rotate needs 32-bit) + masks.
    # The col mask (j = merged index mod Wp) both zeroes the SAME edges and
    # kills cross-row wraps; columns >= w_log are Wp padding, host-sliced.
    col = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_h * wp), 1), wp
    )
    out = None
    for b_ in range(3):
        sh = b_ - 1
        yb = y[b_ * co : (b_ + 1) * co]
        n_ = tile_h * wp
        if sh == 0:
            # centre tap: col+0 is always in [0, w_log) for the logical
            # columns and the Wp-pad columns are host-sliced — no mask pass
            out = yb if out is None else out + yb
            continue
        rolled = pltpu.roll(yb, (-sh) % n_, axis=1)
        mask = ((col + sh >= 0) & (col + sh < w_log)).astype(jnp.float32)
        out = rolled * mask if out is None else out + rolled * mask
    o_ref[0] = out.reshape(co, tile_h, wp).astype(o_ref.dtype)


def _pick_tile_h(h: int, wp: int, ci: int, co: int, itemsize: int,
                 budget_mb: float = 13.0) -> int:
    candidates = [th for th in (128, 64, 32, 16, 8) if th <= h] or [h]
    for th in candidates:
        slab = _round_up(th + 2, 16)
        bytes_needed = (
            2 * ci * slab * wp * itemsize         # x scratch, 2 slots
            + 3 * ci * th * wp * itemsize         # xcol
            + 3 * co * th * wp * 4                # y accumulator (f32)
            + 2 * co * th * wp * 4                # out block (double-buffered)
        )
        if bytes_needed <= budget_mb * 1024 * 1024:
            return th
    return candidates[-1]


def conv3x3_cols_worthwhile(kernel_size, strides, ci: int, co: int,
                            w: int | None = None) -> bool:
    """The kernel applies to stride-1 3x3 convs; it WINS where the native
    lowering is lane-starved (co < 128). W is lane-padded to 128 in-kernel,
    so very narrow maps waste lanes — require a reasonable width."""
    if tuple(kernel_size) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if w is not None and w < 32:
        return False
    return co < 128


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_cols(x, w, interpret: bool = False, out_f32: bool = False):
    """(N, H, W, Ci) x (3, 3, Ci, Co) -> (N, H, W, Co), stride-1 SAME,
    f32 accumulation, differentiable (dx via the same kernel on flipped
    weights; dw via XLA's transpose conv). out_f32=True stores the f32
    accumulator (for callers that chain into a wider sum, e.g. the
    cross-dz accumulation in Conv3dVia2D)."""
    return _conv3x3_cols_fwd_impl(x, w, interpret, out_f32)


def _conv3x3_cols_fwd_impl(x, w, interpret, out_f32=False):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    assert w.shape[:3] == (3, 3, ci), w.shape
    dtype = x.dtype
    out_dtype = jnp.float32 if out_f32 else dtype
    wp = _round_up(wd, 128)
    tile_h = _pick_tile_h(h, wp, ci, co, jnp.dtype(dtype).itemsize)
    hpad = _round_up(h, tile_h)
    nt = hpad // tile_h
    slab = _round_up(tile_h + 2, 16)
    # one zero-pad row on top (the a=0 halo), then enough rows that every
    # slab [i*tile_h, i*tile_h + slab) is in bounds; W lane-padded to 128
    rows = (nt - 1) * tile_h + slab
    x_cm = jnp.moveaxis(x, -1, 1)  # (N, Ci, H, W)
    x_cm = jnp.pad(x_cm, ((0, 0), (0, 0), (1, rows - h - 1), (0, wp - wd)))
    # [(b,co), (a,c)] weight layout for the tap-widened matmul
    w2 = jnp.transpose(w.astype(dtype), (1, 3, 0, 2)).reshape(3 * co, 3 * ci)
    kernel = functools.partial(
        _conv_cols_kernel, tile_h=tile_h, slab=slab, wp=wp, w_log=wd,
        ci=ci, co=co,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, co, hpad, wp), out_dtype),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((3 * co, 3 * ci), lambda bb, ii: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, co, tile_h, wp), lambda bb, ii: (bb, 0, ii, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ci, slab, wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(w2, x_cm)
    return jnp.moveaxis(out[:, :, :h, :wd], 1, -1)


def _conv3x3_cols_vjp_fwd(x, w, interpret, out_f32):
    # this JAX passes custom_vjp fwd the args in their ORIGINAL positions
    # (nondiff included in place); only bwd gets the nondiff args first
    return conv3x3_cols(x, w, interpret, out_f32), (x, w)


def _conv3x3_cols_vjp_bwd(interpret, out_f32, res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    # dx = same-stride SAME correlation of dy with the spatially-flipped,
    # io-transposed kernel — the same pallas kernel, different weights
    wflip = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    dx = conv3x3_cols(dy, wflip, interpret)
    # dw: XLA's transpose rule (a (3,3,ci,co)-output reduction matmul)
    _, vjp = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x, w_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        w,
    )
    (dw,) = vjp(dy)
    return dx, dw


conv3x3_cols.defvjp(_conv3x3_cols_vjp_fwd, _conv3x3_cols_vjp_bwd)


@functools.lru_cache(maxsize=None)
def _make_conv_fn(interpret: bool, out_f32: bool):
    """vmap-safe wrapper (one cached instance per static config): under
    jax.vmap the batch dim folds into the kernel's N grid axis instead of
    letting vmap auto-batch the pallas_call (auto-batching pallas inside
    vmap(scan) hung this environment's remote Mosaic service — same hazard
    and same fix as ops/pallas/corr.py). Grads flow through conv3x3_cols's
    custom VJP either way."""

    @jax.custom_batching.custom_vmap
    def conv(x, w):
        return conv3x3_cols(x, w, interpret, out_f32)

    @conv.def_vmap
    def _rule(axis_size, in_batched, x, w):
        xb, wb = in_batched
        if wb:
            raise NotImplementedError("batched conv weights unsupported")
        if not xb:
            x = jnp.broadcast_to(x[None], (axis_size, *x.shape))
        b, n, h, wd, ci = x.shape
        out = conv3x3_cols(x.reshape(b * n, h, wd, ci), w, interpret, out_f32)
        return out.reshape(b, n, h, wd, out.shape[-1]), True

    return conv


def conv3x3_cols_vb(x, w, interpret: bool = False, out_f32: bool = False):
    """Like conv3x3_cols but safe under jax.vmap (batch folds into N)."""
    return _make_conv_fn(bool(interpret), bool(out_f32))(x, w)
