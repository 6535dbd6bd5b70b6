"""Padding / cropping utilities (host + jittable).

Replaces batchgenerators' `pad_nd_image` (used by the reference's tiled
inference, ref: nnunet/network_architecture/neural_network.py:292-330) and
MONAI's `ResizeWithPadOrCrop` (used by the savers, ref: nnunet/saver.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


def pad_nd_image(
    image: np.ndarray,
    new_shape: Sequence[int] | None = None,
    mode: str = "constant",
    constant_value: float = 0.0,
    shape_must_be_divisible_by: Sequence[int] | None = None,
    return_slicer: bool = False,
):
    """Symmetric pad of trailing spatial axes up to `new_shape` (never crops).

    Matches batchgenerators `pad_nd_image` semantics: leading axes (channels)
    untouched; pad split evenly with the extra voxel at the end; optionally
    round up to divisibility. Returns (padded, slicer) if `return_slicer`,
    where `slicer` recovers the original array.
    """
    old_shape = np.array(image.shape)
    if new_shape is None:
        if shape_must_be_divisible_by is not None:
            new_shape = image.shape[-len(shape_must_be_divisible_by):]
        else:
            new_shape = image.shape
    num_lead = len(image.shape) - len(new_shape)
    target = list(image.shape[:num_lead]) + [
        max(int(n), int(o)) for n, o in zip(new_shape, image.shape[num_lead:])
    ]
    if shape_must_be_divisible_by is not None:
        div = list(shape_must_be_divisible_by)
        assert len(div) == len(target) - num_lead
        for i, d in enumerate(div):
            ax = num_lead + i
            if target[ax] % d != 0:
                target[ax] += d - target[ax] % d
    diff = np.array(target) - old_shape
    pad_below = diff // 2
    pad_above = diff - pad_below
    pad_list = [(int(b), int(a)) for b, a in zip(pad_below, pad_above)]
    if mode == "constant":
        padded = np.pad(image, pad_list, mode=mode, constant_values=constant_value)
    else:
        padded = np.pad(image, pad_list, mode=mode)
    if not return_slicer:
        return padded
    slicer = tuple(
        slice(int(b), int(b + o)) for b, o in zip(pad_below, old_shape)
    )
    return padded, slicer


def center_pad_or_crop(
    image: np.ndarray, target_shape: Sequence[int], constant_value: float = 0.0
) -> tuple[np.ndarray, dict]:
    """Center pad-or-crop trailing spatial axes to exactly `target_shape`.

    Returns the result and an invertible record {'pad': [(b,a)...],
    'crop': [(b,a)...]} (the reference stores an equivalent `padding_need`
    pkl per frame, ref: dataset_loading.py DataLoaderPreprocessed)."""
    num_lead = image.ndim - len(target_shape)
    pads, crops = [(0, 0)] * num_lead, [(0, 0)] * num_lead
    out = image
    # crop first
    slicer = [slice(None)] * num_lead
    for o, t in zip(image.shape[num_lead:], target_shape):
        if o > t:
            b = (o - t) // 2
            slicer.append(slice(b, b + t))
            crops.append((b, o - t - b))
        else:
            slicer.append(slice(None))
            crops.append((0, 0))
    out = out[tuple(slicer)]
    # then pad
    pad_list = [(0, 0)] * num_lead
    for o, t in zip(out.shape[num_lead:], target_shape):
        if o < t:
            b = (t - o) // 2
            pad_list.append((b, t - o - b))
        else:
            pad_list.append((0, 0))
    pads = pad_list
    out = np.pad(out, pad_list, mode="constant", constant_values=constant_value)
    return out, {"pad": pads, "crop": crops, "orig_shape": list(image.shape)}


def invert_center_pad_or_crop(
    image: np.ndarray, record: dict, constant_value: float = 0.0
) -> np.ndarray:
    """Invert :func:`center_pad_or_crop` (the `uncrop` path,
    ref: nnunet/training/network_training/processor.py:162-196)."""
    slicer = tuple(
        slice(b, (None if a == 0 else -a)) for b, a in record["pad"]
    )
    out = image[slicer]
    pad_list = list(record["crop"])
    # leading dims of `image` may differ from the recorded ones (e.g. channels
    # added); align from the right
    extra = out.ndim - len(pad_list)
    pad_list = [(0, 0)] * extra + pad_list[-out.ndim:] if extra >= 0 else pad_list[-out.ndim:]
    return np.pad(out, pad_list, mode="constant", constant_values=constant_value)


def center_crop_jnp(x: jnp.ndarray, target_shape: Sequence[int]) -> jnp.ndarray:
    """Jittable center crop of trailing axes (static shapes)."""
    num_lead = x.ndim - len(target_shape)
    slicer = [slice(None)] * num_lead + [
        slice((o - t) // 2, (o - t) // 2 + t)
        for o, t in zip(x.shape[num_lead:], target_shape)
    ]
    return x[tuple(slicer)]
