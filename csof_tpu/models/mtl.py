"""MTL 2D segmentation model: conv/swin encoder + transformer bottleneck +
seg decoder (+ optional reconstruction branch).

Capability parity with the reference's `MTLmodel`
(ref: nnunet/network_architecture/MTL_model.py:84-560 — conv or swin encoder,
transformer bottleneck, `SegmentationDecoder`, optional
reconstruction/autoencoder branch and directional-field head; built by
`build_2d_model` at ref: nnunet/lib/training_utils.py:1938-1996) and
`ModelWrap` pairing of two models (ref: MTL_model.py:51).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.models.blocks import ConvNormAct
from csof_tpu.models.segflow import Decoder, Encoder
from csof_tpu.models.swin import SwinStage


@dataclass(frozen=True)
class MTLConfig:
    out_encoder_dims: tuple[int, ...] = (32, 64, 128)
    encoder: str = "conv"  # 'conv' | 'swin'
    swin_depths: tuple[int, ...] = (2, 2, 2)
    swin_heads: tuple[int, ...] = (2, 4, 8)
    window: int = 8
    bottleneck_layers: int = 2
    bottleneck_heads: int = 4
    dim_feedforward: int = 512
    reconstruction: bool = False
    directional_field: bool = False
    norm: str = "group"
    dtype: str = "float32"


class TransformerBottleneck(nn.Module):
    """Self-attention bottleneck over flattened spatial tokens
    (ref: MTL_model.py transformer bottleneck)."""

    dim: int
    num_layers: int
    num_heads: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w, c = x.shape
        from csof_tpu.models.attention import sine_pos_embed_2d

        tokens = x.reshape(-1, c).astype(self.dtype)
        if c != self.dim:
            tokens = nn.Dense(self.dim, dtype=self.dtype)(tokens)
        tokens = tokens + sine_pos_embed_2d(h, w, self.dim).astype(self.dtype)
        for _ in range(self.num_layers):
            y = nn.LayerNorm(dtype=self.dtype)(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype
            )(y[None], y[None])[0]
            tokens = tokens + y
            z = nn.LayerNorm(dtype=self.dtype)(tokens)
            z = nn.Dense(self.dim_feedforward, dtype=self.dtype)(z)
            z = nn.gelu(z)
            z = nn.Dense(self.dim, dtype=self.dtype)(z)
            tokens = tokens + z
        return tokens.reshape(h, w, self.dim)


class SwinEncoder(nn.Module):
    out_dims: Sequence[int]
    depths: Sequence[int]
    heads: Sequence[int]
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (1, H, W, C) -> list of per-level skips [(1, h, w, c)...]."""
        from csof_tpu.models.swin import PatchMerging

        x = x[0]
        skips = []
        for i, (dim, depth, head) in enumerate(zip(self.out_dims, self.depths, self.heads)):
            if i == 0:
                x = nn.Dense(dim, dtype=self.dtype)(x)
            else:
                x = PatchMerging(dim, dtype=self.dtype)(x)
            win = min(self.window, x.shape[0])
            x = SwinStage(dim, depth, head, win, dtype=self.dtype)(x)
            skips.append(x[None])
        return skips


class MTLModel(nn.Module):
    cfg: MTLConfig = MTLConfig()
    num_classes: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (H, W, C) -> dict(seg_logits, [reconstruction], [directional_field])."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        if cfg.encoder == "swin":
            skips = SwinEncoder(
                cfg.out_encoder_dims, cfg.swin_depths, cfg.swin_heads, cfg.window, dtype
            )(x[None])
        else:
            skips = Encoder(cfg.out_encoder_dims, cfg.norm, dtype)(x[None])
        skips = [s[0] for s in skips]
        bottleneck = TransformerBottleneck(
            cfg.out_encoder_dims[-1], cfg.bottleneck_layers, cfg.bottleneck_heads,
            cfg.dim_feedforward, dtype,
        )(skips[-1])
        seg_logits, feat = Decoder(
            cfg.out_encoder_dims, self.num_classes, cfg.norm, dtype, name="seg_decoder"
        )(bottleneck, skips)
        out = {"seg_logits": seg_logits}
        if cfg.reconstruction:
            rec, _ = Decoder(cfg.out_encoder_dims, x.shape[-1], cfg.norm, dtype, name="rec_decoder")(
                bottleneck, skips
            )
            out["reconstruction"] = rec
        if cfg.directional_field:
            df = nn.Conv(2, (1, 1), dtype=jnp.float32, name="df_head")(feat.astype(jnp.float32))
            out["directional_field"] = df
        return out


class ModelWrap(nn.Module):
    """Pair two models sharing an input (ref: MTL_model.py:51 ModelWrap)."""

    model1: nn.Module
    model2: nn.Module

    def __call__(self, x):
        return {"model1": self.model1(x), "model2": self.model2(x)}
