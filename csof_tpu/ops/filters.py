"""Separable filters: Gaussian smoothing over N-D arrays.

Capability parity with the reference's `GaussianSmoothing`
(ref: nnunet/lib/vit_transformer.py:121 — fixed-kernel separable Gaussian
used by the gaussian-weighted attention variants) and the gaussian blur in
its augmentation stack.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * float(sigma))))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
    return k / jnp.sum(k)


def gaussian_smooth(x: jnp.ndarray, sigma, axes=None, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur along `axes` (default: all axes) with edge
    padding. sigma: scalar or per-axis sequence. Static radius -> jittable."""
    if axes is None:
        axes = tuple(range(x.ndim))
    sigmas = [sigma] * len(axes) if jnp.ndim(sigma) == 0 and not isinstance(sigma, (list, tuple)) else list(sigma)
    out = x.astype(jnp.float32)
    for ax, s in zip(axes, sigmas):
        k = gaussian_kernel_1d(s, radius)
        r = (k.shape[0] - 1) // 2
        moved = jnp.moveaxis(out, ax, -1)
        shape = moved.shape
        flat = moved.reshape(-1, shape[-1])
        padded = jnp.pad(flat, ((0, 0), (r, r)), mode="edge")
        blurred = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(padded)
        out = jnp.moveaxis(blurred.reshape(shape), -1, ax)
    return out.astype(x.dtype)
