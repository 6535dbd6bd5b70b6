"""Sliding-window tiling math + Gaussian importance weighting.

Capability parity with the reference's tiled inference engine
(ref: nnunet/network_architecture/neural_network.py:251-290 — `_get_gaussian`,
`_compute_steps_for_sliding_window`), re-designed TPU-first:

- step computation stays host-side (static per image shape; step grids become
  static gather/scatter index arrays fed to jit),
- the per-patch Python loop of the reference
  (ref: neural_network.py:379-399) is replaced by one *batched* gather of all
  patches -> a single large-batch forward (MXU-friendly) -> a scatter-add of
  Gaussian-weighted logits back into the HBM-resident volume
  (`extract_patches` / `aggregate_patches`).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter


def compute_steps(
    patch_size: Sequence[int], image_size: Sequence[int], step_size: float
) -> list[list[int]]:
    """Per-axis start coordinates of sliding-window tiles.

    Semantics identical to ref: neural_network.py:267-290: the number of steps
    per axis is ``ceil((image - patch) / (patch * step_size)) + 1`` and the
    steps are spread evenly (rounded) so the first is 0 and the last is
    ``image - patch``.
    """
    if not all(i >= j for i, j in zip(image_size, patch_size)):
        raise ValueError(
            f"image size {tuple(image_size)} must be >= patch size {tuple(patch_size)}"
        )
    if not 0 < step_size <= 1:
        raise ValueError("step_size must be in (0, 1]")

    target = [p * step_size for p in patch_size]
    num_steps = [
        int(np.ceil((i - p) / t)) + 1 for i, t, p in zip(image_size, target, patch_size)
    ]

    steps: list[list[int]] = []
    for dim, n in enumerate(num_steps):
        span = image_size[dim] - patch_size[dim]
        if n > 1:
            actual = span / (n - 1)
            steps.append([int(np.round(actual * k)) for k in range(n)])
        else:
            steps.append([0])
    return steps


def step_grid(
    patch_size: Sequence[int], image_size: Sequence[int], step_size: float
) -> np.ndarray:
    """All tile start coordinates as an (n_tiles, ndim) int array (cartesian
    product of :func:`compute_steps`), row-major like the reference's nested
    loops (ref: neural_network.py:379-386)."""
    per_axis = compute_steps(patch_size, image_size, step_size)
    mesh = np.meshgrid(*[np.asarray(s) for s in per_axis], indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def gaussian_importance_map(
    patch_size: tuple[int, ...], sigma_scale: float = 1.0 / 8
) -> np.ndarray:
    """Gaussian tile-importance map, max-normalized to 1, with zeros replaced
    by the smallest nonzero value (ref: neural_network.py:251-265).

    Computed as scipy `gaussian_filter` of a center delta so truncation
    behavior matches the reference bit-for-bit.
    """
    tmp = np.zeros(patch_size)
    center = tuple(i // 2 for i in patch_size)
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[center] = 1
    g = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    g = (g / np.max(g)).astype(np.float32)
    g[g == 0] = np.min(g[g != 0])
    return g


# ---------------------------------------------------------------------------
# Batched patch gather / Gaussian-weighted scatter-add (jittable)
# ---------------------------------------------------------------------------


def extract_patches(image: jax.Array, starts: jax.Array, patch_size: Sequence[int]) -> jax.Array:
    """Gather all sliding-window tiles as one batch.

    image:  (C, *spatial)
    starts: (n_tiles, ndim) int32 tile origins
    returns (n_tiles, C, *patch_size)

    This replaces the reference's per-tile Python loop so that the whole tile
    batch feeds the MXU in one forward pass.
    """
    patch_size = tuple(patch_size)

    def one(start):
        idx = jnp.concatenate([jnp.zeros((1,), start.dtype), start])
        return jax.lax.dynamic_slice(image, idx, (image.shape[0], *patch_size))

    return jax.vmap(one)(starts)


def aggregate_patches(
    patches: jax.Array,
    starts: jax.Array,
    image_shape: Sequence[int],
    weight_map: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Scatter-add Gaussian-weighted tiles into the full volume.

    patches: (n_tiles, C, *patch)  — e.g. per-tile class logits/softmax
    starts:  (n_tiles, ndim)
    returns (aggregated (C, *spatial), weight_sum (*spatial,)); the caller
    divides (ref aggregation: neural_network.py:398-413).
    """
    patch_size = patches.shape[2:]
    c = patches.shape[1]
    out = jnp.zeros((c, *image_shape), patches.dtype)
    wsum = jnp.zeros(tuple(image_shape), patches.dtype)
    if weight_map is None:
        weight_map = jnp.ones(patch_size, patches.dtype)
    weighted = patches * weight_map[None, None]

    def body(i, carry):
        out, wsum = carry
        start = starts[i]
        idx = jnp.concatenate([jnp.zeros((1,), start.dtype), start])
        cur = jax.lax.dynamic_slice(out, idx, (c, *patch_size))
        out = jax.lax.dynamic_update_slice(out, cur + weighted[i], idx)
        curw = jax.lax.dynamic_slice(wsum, start, patch_size)
        wsum = jax.lax.dynamic_update_slice(wsum, curw + weight_map, start)
        return out, wsum

    out, wsum = jax.lax.fori_loop(0, patches.shape[0], body, (out, wsum))
    return out, wsum


def pad_shape_for_patches(
    image_size: Sequence[int], patch_size: Sequence[int]
) -> tuple[int, ...]:
    """Smallest shape >= image_size with every axis >= patch axis (the
    reference pads with `pad_nd_image` before tiling)."""
    return tuple(max(i, p) for i, p in zip(image_size, patch_size))


def num_tiles(patch_size: Sequence[int], image_size: Sequence[int], step_size: float) -> int:
    return int(np.prod([len(s) for s in compute_steps(patch_size, image_size, step_size)]))


def bucket_image_shape(
    image_size: Sequence[int], patch_size: Sequence[int], step_size: float,
    bucket: int = 32,
) -> tuple[int, ...]:
    """Round image shape up to a bucket multiple (>= patch) so XLA compiles a
    small number of tile-grid variants instead of one per case (static-shape
    requirement; SURVEY.md §7 'Dynamic shapes')."""
    out = []
    for i, p in zip(image_size, patch_size):
        i = max(i, p)
        out.append(int(math.ceil(i / bucket) * bucket) if i > p else i)
    return tuple(out)
