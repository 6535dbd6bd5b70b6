"""VQ-VAE (vector-quantized autoencoder).

Capability parity with ref: nnunet/lib/vq_vae.py (used by the reference's
experimental generative branch): conv encoder -> codebook lookup with
straight-through estimator + commitment loss -> conv decoder.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.models.blocks import ConvNormAct


class VectorQuantizer(nn.Module):
    num_embeddings: int = 256
    embedding_dim: int = 64
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        """z: (..., embedding_dim). Returns (quantized, aux losses dict)."""
        codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.num_embeddings, self.embedding_dim),
        )
        flat = z.reshape(-1, self.embedding_dim)
        d = (
            jnp.sum(flat**2, 1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, 1)[None]
        )
        idx = jnp.argmin(d, axis=1)
        quant = codebook[idx].reshape(z.shape)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z) - quant) ** 2)
        commit_loss = jnp.mean((z - jax.lax.stop_gradient(quant)) ** 2)
        quant = z + jax.lax.stop_gradient(quant - z)  # straight-through
        return quant, {
            "codebook_loss": codebook_loss,
            "commitment_loss": self.commitment_cost * commit_loss,
            "codes": idx.reshape(z.shape[:-1]),
        }


class VQVAE(nn.Module):
    features: Sequence[int] = (32, 64)
    num_embeddings: int = 256
    embedding_dim: int = 64
    out_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (N, H, W, C)."""
        h = x
        for f in self.features:
            h = ConvNormAct(f, (4, 4), strides=(2, 2), norm="group")(h)
        h = nn.Conv(self.embedding_dim, (1, 1))(h)
        quant, aux = VectorQuantizer(self.num_embeddings, self.embedding_dim)(h)
        d = quant
        for f in reversed(self.features):
            d = jnp.repeat(jnp.repeat(d, 2, axis=1), 2, axis=2)
            d = ConvNormAct(f, (3, 3), norm="group")(d)
        recon = nn.Conv(self.out_channels, (1, 1))(d)
        aux["reconstruction"] = recon
        return aux
