"""Attention blocks for the video bottleneck (flax, channels-last).

Capability parity with the reference's transformer library subset actually
used by the flagship model (ref: nnunet/lib/vit_transformer.py —
`CrossAttentionLayer`, `TransformerFlowEncoder*`; sine positional embeddings
per ref: nnunet/lib/position_embedding.py). Spatial feature maps are
flattened to token sequences; attention is dot-product multi-head (MXU
matmuls). Blockwise/flash-style variants can swap in at the Pallas layer
without changing this interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sine_pos_embed_2d(h: int, w: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """(h*w, dim) fixed 2D sine/cosine positional embedding
    (ref: position_embedding.py PositionEmbeddingSine semantics)."""
    assert dim % 4 == 0, "2D sine embedding needs dim % 4 == 0"
    quarter = dim // 4
    omega = 1.0 / (temperature ** (np.arange(quarter) / quarter))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for coord in (ys, xs):
        ang = coord.reshape(-1)[:, None] * omega[None, :]
        out.extend([np.sin(ang), np.cos(ang)])
    return jnp.asarray(np.concatenate(out, axis=1), jnp.float32)


class CrossAttentionLayer(nn.Module):
    """Pre-norm cross-attention + FFN over flattened spatial tokens
    (ref: vit_transformer.py CrossAttentionLayer).

    Attention is written out explicitly (qkv projections + softmax) so the
    per-head weights can be `sow`n into the "intermediates" collection for
    the TensorBoard attention-map visualizer (ref: visualization.py:1035
    `log_attn_map_images`; the reference trainer logs `out['weights']`).
    Callers opt in with `model.apply(..., mutable=["intermediates"])` —
    the sown map is the query-averaged attention over keys, (H, W)."""

    d_model: int
    num_heads: int = 4
    dim_feedforward: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_map: jnp.ndarray, key_map: jnp.ndarray, value_map: jnp.ndarray):
        """query/key/value maps: (H, W, C) -> (H, W, d_model)."""
        h, w, _ = query_map.shape
        pos = sine_pos_embed_2d(h, w, self.d_model).astype(self.dtype)

        def tokens(m):
            t = m.reshape(-1, m.shape[-1]).astype(self.dtype)
            if t.shape[-1] != self.d_model:
                t = nn.Dense(self.d_model, dtype=self.dtype)(t)
            return t

        q = tokens(query_map) + pos
        k = tokens(key_map) + pos
        v = tokens(value_map)
        qn = nn.LayerNorm(dtype=self.dtype)(q)
        nh, hd = self.num_heads, self.d_model // self.num_heads
        qh = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(qn).reshape(-1, nh, hd)
        kh = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(k).reshape(-1, nh, hd)
        vh = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(v).reshape(-1, nh, hd)
        if jnp.dtype(self.dtype) == jnp.bfloat16:
            # bf16 fast path: never materialize the (heads, Q, K) logits or
            # weights in f32 — at the video bottleneck (1024 tokens) those
            # two f32 buffers are ~64 MB per sample-layer and made attention
            # purely HBM-bound (measured 14.3 ms/rep of the SegFlow scan,
            # matching the byte count at HBM bandwidth). Reductions (max,
            # denominator) run in f32; materialized tensors stay bf16 —
            # the same accumulate-wide/store-narrow recipe as the bf16
            # norm fast paths in models/blocks.py.
            logits = jnp.einsum("qhd,khd->hqk", qh, kh) / np.asarray(
                np.sqrt(hd), jnp.bfloat16
            )
            mx = jnp.max(logits.astype(jnp.float32), axis=-1, keepdims=True)
            unnorm = jnp.exp(logits - mx.astype(logits.dtype))
            denom = jnp.sum(unnorm, axis=-1, keepdims=True, dtype=jnp.float32)
            weights = unnorm * (1.0 / denom).astype(unnorm.dtype)
        else:
            logits = jnp.einsum(
                "qhd,khd->hqk", qh, kh, preferred_element_type=jnp.float32
            )
            weights = jax.nn.softmax(logits / np.sqrt(hd), axis=-1)
        # key-space saliency: attention mass each key receives, averaged over
        # heads and queries -> (H, W) map for the visualizer
        self.sow(
            "intermediates", "attn_weights",
            jnp.mean(weights, axis=(0, 1)).reshape(h, w).astype(jnp.float32),
        )
        attn = jnp.einsum("hqk,khd->qhd", weights.astype(self.dtype), vh).reshape(-1, self.d_model)
        attn = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(attn)
        x = q + attn
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype)(y)
        x = x + y
        return x.reshape(h, w, self.d_model)
