"""Adversarial components: patch discriminator + GAN losses.

Capability parity with the reference's adversarial stack
(ref: nnunet/lib/discriminator.py, nnunet/network_architecture/
discriminator.py:47, swin GAN at nnunet/lib/swin_gan.py, adversarial config
keys do_adv/adversarial_weight/discriminator_* in ref: nnunet/video.yaml and
nnunet/adversarial_acdc.yaml).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.models.blocks import ConvNormAct


class PatchDiscriminator(nn.Module):
    """PatchGAN-style conv discriminator over (H, W, C) inputs
    (ref: discriminator.py:47 conv discriminator; depths from
    video.yaml discriminator_depth/out_dims)."""

    features: Sequence[int] = (64, 128, 256)
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, H, W, C) -> (N, h', w', 1) patch logits."""
        for i, f in enumerate(self.features):
            stride = (2, 2) if i > 0 else (1, 1)
            x = ConvNormAct(f, (4, 4), strides=stride, norm=self.norm, dtype=self.dtype)(x)
        return nn.Conv(1, (4, 4), padding="SAME", dtype=jnp.float32)(x.astype(jnp.float32))


def discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating GAN loss for the discriminator (BCE on patch logits)."""
    real = jnp.mean(jax.nn.softplus(-real_logits))
    fake = jnp.mean(jax.nn.softplus(fake_logits))
    return real + fake


def generator_adversarial_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.softplus(-fake_logits))
