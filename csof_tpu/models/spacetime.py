"""Spatio-temporal attention over cine sequences.

Capability parity with the reference's `SpatioTemporalTransformer` /
timesformer-style temporal modeling (ref: nnunet/lib/vit_transformer.py
SpatioTemporalTransformer; video.yaml `timesformer`/`bottleneck_type:
transformer` options): factorized time-then-space attention over (T, H, W)
token grids — O(T^2·HW + HW^2·T) instead of O((THW)^2), the blockwise-
friendly formulation for long cycles (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.models.attention import sine_pos_embed_2d


def sine_pos_embed_1d(t: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    import numpy as np

    half = dim // 2
    omega = 1.0 / (temperature ** (np.arange(half) / half))
    ang = np.arange(t)[:, None] * omega[None]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if emb.shape[1] < dim:
        emb = np.pad(emb, ((0, 0), (0, dim - emb.shape[1])))
    return jnp.asarray(emb, jnp.float32)


class SpatioTemporalBlock(nn.Module):
    """One factorized block: temporal MSA -> spatial MSA -> MLP."""

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (T, H, W, C)."""
        t, h, w, c = x.shape

        # temporal attention: tokens along T for each spatial site
        y = nn.LayerNorm(dtype=self.dtype)(x)
        yt = y.reshape(t, h * w, c).transpose(1, 0, 2)  # (HW, T, C)
        yt = yt + sine_pos_embed_1d(t, c)[None].astype(self.dtype)
        at = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype,
            name="temporal_attn",
        )(yt, yt)
        x = x + at.transpose(1, 0, 2).reshape(t, h, w, c)

        # spatial attention: tokens over HW for each frame
        y = nn.LayerNorm(dtype=self.dtype)(x)
        ys = y.reshape(t, h * w, c)
        ys = ys + sine_pos_embed_2d(h, w, c)[None].astype(self.dtype)
        sp = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype,
            name="spatial_attn",
        )(ys, ys)
        x = x + sp.reshape(t, h, w, c)

        z = nn.LayerNorm(dtype=self.dtype)(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype)(z)
        return x + z


class SpatioTemporalTransformer(nn.Module):
    dim: int
    depth: int = 2
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (T, H, W, C_in) -> (T, H, W, dim)."""
        if x.shape[-1] != self.dim:
            x = nn.Dense(self.dim, dtype=self.dtype)(x)
        for _ in range(self.depth):
            x = SpatioTemporalBlock(self.dim, self.num_heads, dtype=self.dtype)(x)
        return x
