"""Dense-flow warping (grid_sample equivalent) + contour-point warping.

Capability parity with the reference's VoxelMorph ops
(ref: nnunet/network_architecture/integration.py:37-81 `SpatialTransformer` —
identity grid + flow, normalized grid_sample with align_corners=True and
zero padding; ref: integration.py:5-34 `SpatialTransformerContour` — warping
point sets), re-designed as direct voxel-coordinate bilinear gathers (no
normalized-coordinate round-trip, no channel-reversed grid).

Convention: flow is channels-last, `flow[..., d]` is the displacement along
spatial axis `d` in voxels; warped(x) = image(x + flow(x)) (backward warp).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def identity_grid(shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """(*(shape), ndim) voxel-coordinate identity grid."""
    ranges = [jnp.arange(s, dtype=dtype) for s in shape]
    mesh = jnp.meshgrid(*ranges, indexing="ij")
    return jnp.stack(mesh, axis=-1)


def grid_sample(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    mode: str = "bilinear",
    padding: str = "zeros",
) -> jnp.ndarray:
    """Sample `image` (*spatial, C) at continuous voxel `coords`
    (*out_shape, ndim). Returns (*out_shape, C).

    padding: 'zeros' (torch grid_sample default, used by the reference's
    SpatialTransformer) or 'border' (clamp).
    """
    ndim = coords.shape[-1]
    spatial = image.shape[:ndim]
    assert image.ndim == ndim + 1, "image must be (*spatial, C)"

    if mode == "nearest":
        idx = jnp.round(coords).astype(jnp.int32)
        valid = jnp.all((idx >= 0) & (idx < jnp.array(spatial)), axis=-1)
        idx = [jnp.clip(idx[..., d], 0, spatial[d] - 1) for d in range(ndim)]
        out = image[tuple(idx)]
        if padding == "zeros":
            out = out * valid[..., None].astype(image.dtype)
        return out

    floor = jnp.floor(coords)
    frac = coords - floor
    base = floor.astype(jnp.int32)

    if ndim == 2 and mode == "bilinear" and _use_mxu_sample(image, coords):
        return _grid_sample_2d_mxu(image, coords, padding)

    out = jnp.zeros(coords.shape[:-1] + (image.shape[-1],), image.dtype)
    for corner in range(2**ndim):
        offs = [(corner >> d) & 1 for d in range(ndim)]
        idx = [base[..., d] + offs[d] for d in range(ndim)]
        w = jnp.ones(coords.shape[:-1], image.dtype)
        for d in range(ndim):
            w = w * jnp.where(offs[d] == 1, frac[..., d], 1 - frac[..., d])
        if padding == "zeros":
            valid = jnp.ones(coords.shape[:-1], bool)
            for d in range(ndim):
                valid &= (idx[d] >= 0) & (idx[d] < spatial[d])
            w = w * valid.astype(image.dtype)
        cidx = [jnp.clip(idx[d], 0, spatial[d] - 1) for d in range(ndim)]
        out = out + w[..., None] * image[tuple(cidx)]
    return out


def _use_mxu_sample(image, coords) -> bool:
    """Gate for the MXU bilinear path: gathers are scalar-unit work on TPU
    (the dominant cost of dense warps), while the two-hot-selector matmul
    rides the systolic array — but its (n, W, C) intermediate must stay
    small. Off for CPU-ish tiny shapes, wide-channel images, or if
    CSOF_WARP_IMPL=gather."""
    import os
    import numpy as np

    impl = os.environ.get("CSOF_WARP_IMPL", "mxu")
    if impl != "mxu":
        return False
    n = int(np.prod(coords.shape[:-1]))
    h, w = image.shape[0], image.shape[1]
    c = image.shape[-1]
    return n >= 1024 and (n * w * c) <= 64 * 1024 * 1024 and h >= 16 and w >= 16


def _grid_sample_2d_mxu(image: jnp.ndarray, coords: jnp.ndarray, padding: str) -> jnp.ndarray:
    """Dense 2D bilinear sampling as two-hot selector matmuls (zero gathers).

    out[n] = Ry[n, :] @ image @ diag-free Cx[n, :] reduction, where
    Ry[n, y] = (1-fy)[y == y0] + fy[y == y0+1] (likewise Cx for columns):
    bilinear interpolation IS a two-hot linear map per axis, so the sample
    becomes tmp = Ry @ image (MXU matmul) followed by a weighted column
    reduction. Out-of-range taps produce all-zero selector rows, which is
    exactly zero-padded bilinear sampling; border padding clamps coords
    first. Same trick as ops/correlation.lookup_correlation (RAFT lookup,
    5.1x) — gathers are scalar-unit work on TPU, matmuls are not.
    """
    h, w, c = image.shape
    out_shape = coords.shape[:-1]
    n = 1
    for s in out_shape:
        n *= s
    cc = coords.reshape(n, 2).astype(jnp.float32)
    if padding == "border":
        cc = jnp.stack(
            [jnp.clip(cc[:, 0], 0.0, h - 1.0), jnp.clip(cc[:, 1], 0.0, w - 1.0)],
            axis=-1,
        )
    cy, cx = cc[:, 0], cc[:, 1]
    y0f, x0f = jnp.floor(cy), jnp.floor(cx)
    fy, fx = (cy - y0f)[:, None], (cx - x0f)[:, None]
    y0 = y0f.astype(jnp.int32)[:, None]
    x0 = x0f.astype(jnp.int32)[:, None]
    ygrid = jnp.arange(h, dtype=jnp.int32)[None, :]
    xgrid = jnp.arange(w, dtype=jnp.int32)[None, :]
    ry = (ygrid == y0) * (1 - fy) + (ygrid == y0 + 1) * fy  # (n, H)
    cxm = (xgrid == x0) * (1 - fx) + (xgrid == x0 + 1) * fx  # (n, W)
    tmp = jnp.einsum(
        "ny,ywc->nwc", ry, image.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum("nwc,nw->nc", tmp, cxm, preferred_element_type=jnp.float32)
    return out.reshape(*out_shape, c).astype(image.dtype)


def warp_image(
    image: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear", padding: str = "zeros"
) -> jnp.ndarray:
    """Backward-warp a single image (*spatial, C) by `flow` (*spatial, ndim)
    (ref: integration.py:61-81 SpatialTransformer.forward)."""
    grid = identity_grid(flow.shape[:-1], flow.dtype) + flow
    return grid_sample(image, grid, mode=mode, padding=padding)


def warp_image_cm(
    image: jnp.ndarray, flow_cm: jnp.ndarray, mode: str = "bilinear", padding: str = "zeros"
) -> jnp.ndarray:
    """Backward-warp with CHANNEL-MAJOR flow (ndim, *spatial).

    TPU memory layout: a channels-last (*spatial, 2) flow puts 2 on the lane
    (minor) axis, which the compiler pads to 128 — 64x the memory for every
    materialized flow buffer (measured: the b=8 SegFlow OOM,
    docs/BENCHMARKS.md). (2, H, W) keeps W on lanes / H on sublanes with no
    padding; the transient channels-last view built here fuses into the
    sampler's per-axis plane splits instead of being stored."""
    flow = jnp.moveaxis(flow_cm, 0, -1)
    return warp_image(image, flow, mode=mode, padding=padding)


def warp_batch(images: jnp.ndarray, flows: jnp.ndarray, mode: str = "bilinear", padding: str = "zeros") -> jnp.ndarray:
    """vmap of :func:`warp_image` over a leading batch axis.

    images: (N, *spatial, C); flows: (N, *spatial, ndim).
    """
    return jax.vmap(lambda im, fl: warp_image(im, fl, mode=mode, padding=padding))(images, flows)


def warp_seg_onehot(seg: jnp.ndarray, flow: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Warp an integer seg map by bilinear-warping its one-hot channels then
    argmaxing — the exact semantics the reference uses for dice-via-warp
    (ref: nnunet/network_architecture/SegFlowGaussian.py:512-524)."""
    oh = jax.nn.one_hot(seg.astype(jnp.int32), num_classes, dtype=flow.dtype)
    warped = warp_image(oh, flow, mode="bilinear", padding="zeros")
    return jnp.argmax(warped, axis=-1)


def warp_points(points: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Advect contour points through a dense flow field
    (ref: integration.py:5-34 SpatialTransformerContour): sample the flow at
    each (continuous) point location and displace the point.

    points: (P, ndim) voxel coords; flow: (*spatial, ndim).
    """
    sampled = grid_sample(flow, points, mode="bilinear", padding="border")
    return points + sampled


def compose_flows(flow_ab: jnp.ndarray, flow_bc: jnp.ndarray) -> jnp.ndarray:
    """Compose two backward displacement fields:
    result(x) = flow_bc(x) + flow_ab(x + flow_bc(x)), so that
    warp(img, result) == warp(warp(img, flow_ab), flow_bc)."""
    return flow_bc + warp_image(flow_ab, flow_bc, mode="bilinear", padding="border")


def resize_flow(flow: jnp.ndarray, new_spatial: Sequence[int]) -> jnp.ndarray:
    """Resize a flow field and rescale its per-axis magnitudes (the export
    path rescales flow per axis when resampling back to original spacing,
    ref: nnunet/inference/segmentation_export.py:114-124)."""
    old_spatial = flow.shape[:-1]
    resized = jax.image.resize(flow, (*new_spatial, flow.shape[-1]), method="linear")
    scale = jnp.array(
        [n / o for n, o in zip(new_spatial, old_spatial)], dtype=flow.dtype
    )
    return resized * scale
