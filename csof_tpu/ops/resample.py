"""Spacing resampling with nnU-Net separate-z anisotropy semantics.

Host-side (numpy/scipy) for bit-parity with the reference
(ref: nnunet/preprocessing/preprocessing.py:28-200 — `get_do_separate_z`,
`get_lowres_axis`, `resample_patient`, `resample_data_or_seg`). The reference
uses skimage `resize` whose coordinate map is ``scale * (i + 0.5) - 0.5``
(it inlines exactly that formula at preprocessing.py:158-166); we implement
that map directly with `scipy.ndimage.map_coordinates`, so no skimage
dependency is needed.

Resampling runs once per case offline / at export, so it stays on host; the
device-side fast path for on-TPU zoom lives in :mod:`csof_tpu.ops.warp`
(bilinear `resize_ndimage`).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from scipy.ndimage import map_coordinates

ANISO_THRESHOLD = 3  # ref: nnunet/configuration.py:4


def spline_resize(
    data: np.ndarray, new_shape: Sequence[int], order: int = 3, mode: str = "nearest"
) -> np.ndarray:
    """skimage.transform.resize(anti_aliasing=False, mode='edge') equivalent."""
    new_shape = tuple(int(s) for s in new_shape)
    if tuple(data.shape) == new_shape:
        return data.copy()
    scales = [o / n for o, n in zip(data.shape, new_shape)]
    grids = np.meshgrid(
        *[s * (np.arange(n) + 0.5) - 0.5 for s, n in zip(scales, new_shape)],
        indexing="ij",
    )
    coords = np.stack(grids)
    return map_coordinates(data.astype(float), coords, order=order, mode=mode)


def resize_segmentation(seg: np.ndarray, new_shape: Sequence[int], order: int = 1) -> np.ndarray:
    """Label-safe resize: order-0 nearest, or per-label one-hot spline resize
    thresholded at 0.5 (semantics of batchgenerators' `resize_segmentation`,
    which the reference imports at ref: preprocessing.py:17)."""
    dtype = seg.dtype
    if order == 0:
        return spline_resize(seg, new_shape, order=0).astype(dtype)
    out = np.zeros(tuple(new_shape), dtype=dtype)
    for label in np.unique(seg):
        mask = (seg == label).astype(float)
        out[spline_resize(mask, new_shape, order=order) >= 0.5] = label
    return out


def get_do_separate_z(spacing, threshold: float = ANISO_THRESHOLD) -> bool:
    return (np.max(spacing) / np.min(spacing)) > threshold


def get_lowres_axis(spacing) -> np.ndarray:
    return np.where(max(spacing) / np.array(spacing) == 1)[0]


def compute_new_shape(shape, original_spacing, target_spacing) -> np.ndarray:
    return np.round(
        (np.array(original_spacing) / np.array(target_spacing)).astype(float) * np.array(shape)
    ).astype(int)


def resample_data_or_seg(
    data: np.ndarray,
    new_shape: Sequence[int],
    is_seg: bool,
    axis: np.ndarray | None = None,
    order: int = 3,
    do_separate_z: bool = False,
    order_z: int = 0,
) -> np.ndarray:
    """(c, x, y, z) resample; if `do_separate_z`, resample each slice along the
    anisotropic `axis` in-plane with `order`, then interpolate across the axis
    with `order_z` (ref: preprocessing.py:111-200)."""
    assert data.ndim == 4, "data must be (c, x, y, z)"
    new_shape = np.array([int(s) for s in new_shape])
    shape = np.array(data.shape[1:])
    dtype_data = data.dtype
    if np.all(shape == new_shape):
        return data

    resize_fn = resize_segmentation if is_seg else spline_resize
    data = data.astype(float)
    out_channels = []
    if do_separate_z:
        assert axis is not None and len(axis) == 1, "only one anisotropic axis supported"
        ax = int(axis[0])
        new_shape_2d = np.delete(new_shape, ax)
        for c in range(data.shape[0]):
            slices = [
                resize_fn(np.take(data[c], s, axis=ax), new_shape_2d, order).astype(dtype_data)
                for s in range(shape[ax])
            ]
            stacked = np.stack(slices, axis=ax)
            if shape[ax] != new_shape[ax]:
                # interpolate along the anisotropic axis with order_z using the
                # same half-pixel coordinate map
                scales = [o / n for o, n in zip(stacked.shape, new_shape)]
                grids = np.meshgrid(
                    *[s * (np.arange(n) + 0.5) - 0.5 for s, n in zip(scales, new_shape)],
                    indexing="ij",
                )
                coords = np.stack(grids)
                if not is_seg or order_z == 0:
                    out_channels.append(
                        map_coordinates(stacked, coords, order=order_z, mode="nearest")[None].astype(dtype_data)
                    )
                else:
                    reshaped = np.zeros(tuple(new_shape), dtype=dtype_data)
                    for label in np.unique(stacked):
                        mask = (stacked == label).astype(float)
                        up = np.round(map_coordinates(mask, coords, order=order_z, mode="nearest"))
                        reshaped[up > 0.5] = label
                    out_channels.append(reshaped[None])
            else:
                out_channels.append(stacked[None])
        return np.vstack(out_channels)
    else:
        return np.stack(
            [resize_fn(data[c], new_shape, order).astype(dtype_data) for c in range(data.shape[0])]
        )


def resample_patient(
    data: np.ndarray | None,
    seg: np.ndarray | None,
    original_spacing,
    target_spacing,
    order_data: int = 3,
    order_seg: int = 0,
    force_separate_z: bool | None = False,
    order_z_data: int = 0,
    order_z_seg: int = 0,
    separate_z_anisotropy_threshold: float = ANISO_THRESHOLD,
):
    """Joint data+seg resample to target spacing
    (ref: preprocessing.py:38-109)."""
    assert data is not None or seg is not None
    ref_arr = data if data is not None else seg
    assert ref_arr.ndim == 4, "data/seg must be (c, x, y, z)"
    shape = np.array(ref_arr[0].shape)
    new_shape = compute_new_shape(shape, original_spacing, target_spacing)

    if force_separate_z is not None:
        do_separate_z = force_separate_z
        axis = get_lowres_axis(original_spacing) if force_separate_z else None
    elif get_do_separate_z(original_spacing, separate_z_anisotropy_threshold):
        do_separate_z, axis = True, get_lowres_axis(original_spacing)
    elif get_do_separate_z(target_spacing, separate_z_anisotropy_threshold):
        do_separate_z, axis = True, get_lowres_axis(target_spacing)
    else:
        do_separate_z, axis = False, None

    if axis is not None and len(axis) != 1:
        # all-axes or in-plane anisotropy: fall back to joint resampling
        do_separate_z = False

    data_out = (
        resample_data_or_seg(data, new_shape, False, axis, order_data, do_separate_z, order_z=order_z_data)
        if data is not None
        else None
    )
    seg_out = (
        resample_data_or_seg(seg, new_shape, True, axis, order_seg, do_separate_z, order_z=order_z_seg)
        if seg is not None
        else None
    )
    return data_out, seg_out
