"""Temporal video segmentation model (the reference's experimental
`temporal_model.VideoModel`, ref: nnunet/network_architecture/
temporal_model.py:71-822).

Capability: segment a whole cine sequence jointly — per-frame conv encoder,
a spatio-temporal transformer bottleneck augmented with a learned per-frame
*memory bus* (ref :131 `self.memory_bus = nn.Parameter(torch.randn(
video_length, d_model))`; queried by a transformer decoder, ref :152), and a
per-frame decoder with shared parameters.

TPU-first re-design: frames are batched through the encoder/decoder in one
pass (a leading T axis, no Python loop over frames); the bottleneck is the
factorized time-then-space transformer (models/spacetime.py), which is
O(T^2·HW + HW^2·T) instead of the reference's full joint attention; the
memory bus participates as T extra tokens in the temporal attention and is
read back via a small cross-attention (the reference's TransformerDecoder
role).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.models.attention import sine_pos_embed_2d
from csof_tpu.models.segflow import Decoder, Encoder
from csof_tpu.models.spacetime import SpatioTemporalTransformer, sine_pos_embed_1d


class TemporalVideoSegModel(nn.Module):
    """(T, H, W, C_in) cine -> (T, H, W, num_classes) segmentation."""

    out_encoder_dims: Sequence[int] = (16, 32, 64)
    d_model: int = 64
    num_classes: int = 4
    num_heads: int = 4
    depth: int = 1
    video_length: int = 8  # size of the learned memory bus
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray):
        t = video.shape[0]
        dtype = jnp.dtype(self.dtype)
        skips = Encoder(self.out_encoder_dims, self.norm, dtype, name="encoder")(
            video.astype(dtype)
        )  # list of (T, h_l, w_l, f_l)
        bott = skips[-1]
        _, hb, wb, _ = bott.shape

        x = SpatioTemporalTransformer(
            self.d_model, depth=self.depth, num_heads=self.num_heads, dtype=dtype,
            name="bottleneck",
        )(bott)

        # learned memory bus: one token per frame slot (ref :131); tokens are
        # blended into each frame's features via cross-attention from the
        # frame tokens to the bus (the reference's TransformerDecoder reads
        # the bus back into the feature maps through a dot product, ref :200)
        bus = self.param(
            "memory_bus", nn.initializers.normal(0.02), (self.video_length, self.d_model),
            jnp.float32,
        ).astype(dtype)
        bus_t = bus[:t] if t <= self.video_length else jnp.pad(
            bus, ((0, t - self.video_length), (0, 0))
        )
        bus_t = bus_t + sine_pos_embed_1d(t, self.d_model).astype(dtype)
        tokens = x.reshape(t, hb * wb, self.d_model)
        tokens = tokens + sine_pos_embed_2d(hb, wb, self.d_model)[None].astype(dtype)
        read = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model, dtype=dtype,
            name="bus_read",
        )(tokens, bus_t[None].repeat(t, axis=0))
        x = (tokens + read).reshape(t, hb, wb, self.d_model)

        # shared-parameter decoder batched over frames (the reference loops
        # frames in Python; nn.vmap keeps one copy of the params)
        dec = nn.vmap(
            Decoder,
            in_axes=(0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(self.out_encoder_dims, self.num_classes, self.norm, dtype, name="decoder")
        logits, _ = dec(x, skips)
        return logits
