"""Swin transformer blocks (window attention, shifted windows, merging).

Capability parity with the reference's swin library subset used by its
models (ref: nnunet/lib/swin_transformer.py:182 `WindowAttention`, :280
`SwinTransformerBlock` with shifted windows + relative position bias;
swin_cross_attention.py), channels-last and MXU-friendly: window partition
is pure reshape/transpose, attention is batched dot-product over
(num_windows, tokens, dim).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(H, W, C) -> (num_windows, window*window, C)."""
    h, w, c = x.shape
    x = x.reshape(h // window, window, w // window, window, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(-1, window * window, c)


def window_unpartition(wins: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    c = wins.shape[-1]
    x = wins.reshape(h // window, w // window, window, window, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def relative_position_index(window: int) -> np.ndarray:
    """(window^2, window^2) index into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """Multi-head attention within windows with learned relative position
    bias (ref: swin_transformer.py:182)."""

    dim: int
    num_heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None):
        """x: (nW, N, C) windows; mask: (nW, N, N) additive or None."""
        nw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype)(x)
        qkv = qkv.reshape(nw, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (nW, heads, N, hd)
        attn = jnp.einsum("whnd,whmd->whnm", q, k, preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(head_dim)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            attn = attn + mask[:, None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, v).transpose(0, 2, 1, 3).reshape(nw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


def shifted_window_mask(h: int, w: int, window: int, shift: int) -> jnp.ndarray:
    """Additive attention mask for shifted windows (ref swin recipe)."""
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    wins = window_partition(jnp.asarray(img_mask[..., None], jnp.float32), window)[..., 0]
    diff = wins[:, :, None] - wins[:, None, :]
    return jnp.where(diff == 0, 0.0, -1e9)


class SwinBlock(nn.Module):
    """W-MSA / SW-MSA + MLP with pre-norm residuals
    (ref: swin_transformer.py:280 SwinTransformerBlock)."""

    dim: int
    num_heads: int
    window: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (H, W, C), H and W divisible by window."""
        h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(0, 1))
            mask = shifted_window_mask(h, w, self.window, self.shift)
        else:
            mask = None
        wins = window_partition(y, self.window)
        wins = WindowAttention(self.dim, self.num_heads, self.window, self.dtype)(wins, mask)
        y = window_unpartition(wins, self.window, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(0, 1))
        x = shortcut + y
        z = nn.LayerNorm(dtype=self.dtype)(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(z)
        z = nn.gelu(z, approximate=False)  # ref Mlp uses exact-erf nn.GELU
        z = nn.Dense(self.dim, dtype=self.dtype)(z)
        return x + z


class SwinStage(nn.Module):
    """`depth` alternating W-MSA / SW-MSA blocks."""

    dim: int
    depth: int
    num_heads: int
    window: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.window // 2
            x = SwinBlock(self.dim, self.num_heads, self.window, shift, dtype=self.dtype)(x)
        return x


class PatchMerging(nn.Module):
    """2x downsample by 2x2 patch concat + linear (ref swin)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w, c = x.shape
        x = x.reshape(h // 2, 2, w // 2, 2, c).transpose(0, 2, 1, 3, 4).reshape(h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)
