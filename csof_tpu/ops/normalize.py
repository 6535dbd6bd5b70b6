"""Intensity normalization schemes (numpy host path + jittable device path).

Semantics of the reference's `resample_and_normalize` normalization block
(ref: nnunet/preprocessing/preprocessing.py:283-321): per-modality z-score
(optionally within the nonzero mask), CT global clip+standardize from dataset
intensity properties, CT2 per-case, noNorm. Plus the min-max normalization
the video dataloaders use (ref: nnunet/training/dataloading/
dataset_loading.py:6517).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def normalize_modality(
    channel: np.ndarray,
    scheme: str,
    *,
    use_nonzero_mask: bool = False,
    nonzero_mask: np.ndarray | None = None,
    intensity_properties: dict | None = None,
) -> np.ndarray:
    """Normalize one modality channel in place-semantics-free numpy."""
    channel = channel.astype(np.float32, copy=True)
    if scheme == "CT":
        if intensity_properties is None:
            raise ValueError("CT normalization requires dataset intensity properties")
        lb = intensity_properties["percentile_00_5"]
        ub = intensity_properties["percentile_99_5"]
        channel = np.clip(channel, lb, ub)
        channel = (channel - intensity_properties["mean"]) / intensity_properties["sd"]
        if use_nonzero_mask and nonzero_mask is not None:
            channel[~nonzero_mask] = 0
    elif scheme == "CT2":
        if intensity_properties is None:
            raise ValueError("CT2 normalization requires dataset intensity properties")
        lb = intensity_properties["percentile_00_5"]
        ub = intensity_properties["percentile_99_5"]
        inrange = (channel > lb) & (channel < ub)
        channel = np.clip(channel, lb, ub)
        mn, sd = channel[inrange].mean(), channel[inrange].std()
        channel = (channel - mn) / sd
        if use_nonzero_mask and nonzero_mask is not None:
            channel[~nonzero_mask] = 0
    elif scheme == "noNorm":
        pass
    else:  # z-score
        if use_nonzero_mask and nonzero_mask is not None:
            vals = channel[nonzero_mask]
            channel[nonzero_mask] = (vals - vals.mean()) / (vals.std() + 1e-8)
            channel[~nonzero_mask] = 0
        else:
            channel = (channel - channel.mean()) / (channel.std() + 1e-8)
    return channel


def normalize_case(
    data: np.ndarray,
    schemes: dict[int, str],
    use_nonzero_mask: dict[int, bool],
    seg: np.ndarray | None = None,
    intensity_properties: dict[int, dict] | None = None,
) -> np.ndarray:
    """Normalize all modalities of a (c, *spatial) case. The nonzero mask is
    `seg[-1] >= 0` as in the reference (cropping stores -1 outside the
    nonzero bbox, ref: preprocessing/cropping.py:105)."""
    mask = (seg[-1] >= 0) if seg is not None else None
    out = np.empty_like(data, dtype=np.float32)
    for c in range(data.shape[0]):
        props = intensity_properties.get(c) if intensity_properties else None
        out[c] = normalize_modality(
            data[c],
            schemes.get(c, "zscore"),
            use_nonzero_mask=bool(use_nonzero_mask.get(c, False)),
            nonzero_mask=mask,
            intensity_properties=props,
        )
    return out


# -- jittable device-side variants (used inside data pipelines / inference) --


def zscore(x: jnp.ndarray, axis=None, eps: float = 1e-8) -> jnp.ndarray:
    mn = jnp.mean(x, axis=axis, keepdims=axis is not None)
    sd = jnp.std(x, axis=axis, keepdims=axis is not None)
    return (x - mn) / (sd + eps)


def minmax(x: jnp.ndarray, axis=None, eps: float = 1e-8) -> jnp.ndarray:
    """Min-max to [0, 1] (video loaders, ref: dataset_loading.py:6517)."""
    lo = jnp.min(x, axis=axis, keepdims=axis is not None)
    hi = jnp.max(x, axis=axis, keepdims=axis is not None)
    return (x - lo) / (hi - lo + eps)
