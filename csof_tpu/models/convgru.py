"""Convolutional GRU cells (flax, channels-last).

Capability parity with the reference's ConvGRU
(ref: nnunet/network_architecture/convGRU.py:7-120 `ConvGRUCell`) and the
RAFT separable GRU (pinned by torchvision raft_large, see
ref: nnMTLTrainerV2Raft.py:97). Recurrence over frames/iterations is driven
by `lax.scan` in the caller so XLA compiles one fused loop body.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvGRUCell(nn.Module):
    """z = sigma(Wz*[x,h]); r = sigma(Wr*[x,h]); q = tanh(Wq*[x, r.h]);
    h' = (1-z).h + z.q   (ref: convGRU.py:55-117)."""

    hidden_dim: int
    kernel_size: Sequence[int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hx = jnp.concatenate([x, h], axis=-1)
        zr = nn.Conv(2 * self.hidden_dim, self.kernel_size, padding="SAME", dtype=self.dtype)(hx)
        z, r = jnp.split(nn.sigmoid(zr), 2, axis=-1)
        q = nn.tanh(
            nn.Conv(self.hidden_dim, self.kernel_size, padding="SAME", dtype=self.dtype)(
                jnp.concatenate([x, r * h], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class SepConvGRUCell(nn.Module):
    """RAFT's separable GRU: a 1x5 GRU followed by a 5x1 GRU."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvGRUCell(self.hidden_dim, (1, 5), dtype=self.dtype)(h, x)
        h = ConvGRUCell(self.hidden_dim, (5, 1), dtype=self.dtype)(h, x)
        return h
