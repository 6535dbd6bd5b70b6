"""Deformable attention (Deformable-DETR style sparse sampling).

Capability parity with the reference's `deformableAttention*` family
(ref: nnunet/lib/vit_transformer.py:4220+, enabled by `deformable: true` in
ref: nnunet/video.yaml): each query predicts K sampling offsets + weights
per head and aggregates bilinearly-sampled values — O(HW * K) instead of
O((HW)^2) dense attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.ops.warp import grid_sample, identity_grid


class DeformableAttention2D(nn.Module):
    dim: int
    num_heads: int = 4
    num_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_map: jnp.ndarray, value_map: jnp.ndarray):
        """query_map: (H, W, Cq); value_map: (Hv, Wv, Cv) -> (H, W, dim)."""
        h, w, _ = query_map.shape
        hv, wv, _ = value_map.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype)(query_map)
        v = nn.Dense(self.dim, dtype=self.dtype)(value_map)

        # per-query offsets + weights: (H, W, heads, points, 2) / (...points)
        off = nn.Dense(
            self.num_heads * self.num_points * 2,
            dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.normal(1.0),
            name="offsets",
        )(q.astype(jnp.float32)).reshape(h, w, self.num_heads, self.num_points, 2)
        wgt = nn.Dense(
            self.num_heads * self.num_points, dtype=jnp.float32, name="weights"
        )(q.astype(jnp.float32)).reshape(h, w, self.num_heads, self.num_points)
        wgt = jax.nn.softmax(wgt, axis=-1)

        # reference points scaled to the value grid
        ref = identity_grid((h, w)) * jnp.array([hv / h, wv / w])
        pts = ref[:, :, None, None, :] + off  # (H, W, heads, points, 2)

        v_heads = v.reshape(hv, wv, self.num_heads, head_dim)
        out_heads = []
        for head in range(self.num_heads):
            sampled = grid_sample(
                v_heads[:, :, head].astype(jnp.float32),
                pts[:, :, head].reshape(h, w * self.num_points, 2),
                mode="bilinear",
                padding="border",
            ).reshape(h, w, self.num_points, head_dim)
            out_heads.append(jnp.sum(sampled * wgt[:, :, head, :, None], axis=2))
        out = jnp.concatenate(out_heads, axis=-1).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class DeformableTransformerLayer(nn.Module):
    """Pre-norm deformable cross-attention + FFN (drop-in alternative to
    CrossAttentionLayer for the SegFlow bottleneck)."""

    dim: int
    num_heads: int = 4
    num_points: int = 4
    dim_feedforward: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_map: jnp.ndarray, value_map: jnp.ndarray):
        x = query_map
        if x.shape[-1] != self.dim:
            x = nn.Dense(self.dim, dtype=self.dtype)(x)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = DeformableAttention2D(self.dim, self.num_heads, self.num_points, self.dtype)(
            y, value_map
        )
        x = x + y
        z = nn.LayerNorm(dtype=self.dtype)(x)
        z = nn.Dense(self.dim_feedforward, dtype=self.dtype)(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype)(z)
        return x + z
