"""Space-to-depth (2x2) packed 3x3 convolution — the C=32 plateau breaker.

Round-5 decision probes (tools/bench_conv3d.py s2d_* cases, on-chip;
docs/BENCHMARKS.md round-5 adjudication) showed the stride-1 3x3 C=32 conv
that dominates Task002 3d_fullres training — the via-2D inner conv of every
full-resolution stage (ref geometry: nnunet Task002 plans, patch
(80,192,160), base features 32) — is pinned at 29 TF/s by MXU tile
occupancy: 32 input lanes in the contraction, 32 output lanes. Packing each
2x2 spatial cell into channels (H,W,C) -> (H/2,W/2,4C) makes BOTH tiles
full (128) and the SAME logical conv runs 1.8x faster under grad
(52.1 useful TF/s measured).

Exactness: a stride-1 3x3 SAME conv on the original grid is EXACTLY one
k=2 conv on the packed grid. Output pixel (2i+py, 2j+px) reads input rows
2i+py-1 .. 2i+py+1, which lie inside the 2x2 window of packed cells
{i-1+py, i+py} x {j-1+px, j+px}. One conv can only use one window offset,
so the packed weight computes phase (py,px) at the window ANCHORED at
(i+py-1, j+px-1) and the caller re-aligns each phase block with a
one-cell slice — the packed weight's tap (u, v, block q=(qy,qx),
block p=(py,px)) holds w[2u+qy-1+py, 2v+qx-1+px] with structural zeros
where the index leaves 0..2 (16/9 useful-FLOP inflation, exact math).

Channel order is BLOCK-MAJOR: packed channel = (2*dy+dx)*C + c, so each
block keeps the logical C contiguous (norm statistics and weight packing
stay slice-wise; C=32 -> the packed 128 is exactly one lane tile).

The logical (3,3,ci,co) kernel stays the parameter — packing happens at
trace time — so checkpoints transfer between impls unchanged (same
contract as Conv3dVia2D / TapsumConv / PallasConv in models/blocks.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csof_tpu.ops.tapsum_conv import conv2d_f32acc


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C), block-major packed channels
    (packed channel = (2*dy+dx)*C + c). H and W must be even."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    nd = len(lead)
    # (..., h', 2, w', 2, c) -> (..., h', w', 2, 2, c)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    x = x.transpose(perm)
    return x.reshape(*lead, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    *lead, hp, wp, c4 = x.shape
    c = c4 // 4
    nd = len(lead)
    x = x.reshape(*lead, hp, wp, 2, 2, c)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    x = x.transpose(perm)
    return x.reshape(*lead, hp * 2, wp * 2, c)


def pack_weight(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, ci, co) logical kernel -> (2, 2, 4ci, 4co) packed kernel.

    Built at trace time from the logical parameter; XLA constant-folds the
    concatenations (tiny tensors), so the runtime op is just the k=2 conv.
    """
    ci, co = w.shape[2], w.shape[3]
    z = jnp.zeros((ci, co), w.dtype)

    def blk(u, v):
        rows = []
        for qy in (0, 1):
            for qx in (0, 1):
                cols = []
                for py in (0, 1):
                    for px in (0, 1):
                        ky = 2 * u + qy - 1 + py
                        kx = 2 * v + qx - 1 + px
                        cols.append(
                            w[ky, kx]
                            if 0 <= ky <= 2 and 0 <= kx <= 2
                            else z
                        )
                rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)

    return jnp.stack(
        [jnp.stack([blk(u, v) for v in (0, 1)], axis=0) for u in (0, 1)],
        axis=0,
    )


def conv2d_s2d_packed(
    xp: jnp.ndarray, w: jnp.ndarray, f32_acc: bool = False
) -> jnp.ndarray:
    """Stride-1 3x3 SAME conv, packed-in / packed-out.

    xp: (N, H', W', 4*ci) space-to-depth packed input (block-major).
    w:  (3, 3, ci, co) LOGICAL kernel (the parameter).
    Returns (N, H', W', 4*co) packed output == space_to_depth(conv(x, w)).
    """
    ci = xp.shape[-1] // 4
    co = w.shape[-1]
    assert w.shape[:3] == (3, 3, ci), (w.shape, xp.shape)
    wp = pack_weight(w.astype(xp.dtype))
    pad = ((1, 1), (1, 1))
    if f32_acc:
        y = conv2d_f32acc(xp, wp, (1, 1), pad)
    else:
        y = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    # realign: phase (py,px) of output cell (i,j) was computed at conv
    # index (i+py-1, j+px-1) = padded-array position (i+py, j+px)
    n, hp1, wp1, _ = y.shape
    hp, wpk = hp1 - 1, wp1 - 1
    parts = [
        y[:, py : py + hp, px : px + wpk, (2 * py + px) * co : (2 * py + px + 1) * co]
        for py in (0, 1)
        for px in (0, 1)
    ]
    return jnp.concatenate(parts, axis=-1)


def conv2d_s2d(x: jnp.ndarray, w: jnp.ndarray, f32_acc: bool = False) -> jnp.ndarray:
    """Unpacked-in / unpacked-out convenience (parity tests, per-call use):
    pack -> packed conv -> unpack. The stage-level path in models/blocks.py
    keeps tensors packed across the whole conv stack instead."""
    return depth_to_space(conv2d_s2d_packed(space_to_depth(x), w, f32_acc))
