"""Discriminator / VQ-VAE tests."""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.models.discriminator import (
    PatchDiscriminator,
    discriminator_loss,
    generator_adversarial_loss,
)
from csof_tpu.models.vqvae import VQVAE


def test_discriminator_shapes_and_losses():
    d = PatchDiscriminator(features=(8, 16))
    x = jnp.zeros((2, 32, 32, 1))
    params = d.init(jax.random.PRNGKey(0), x)
    logits = d.apply(params, x)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    real = jnp.ones_like(logits) * 3
    fake = -jnp.ones_like(logits) * 3
    # confident correct discriminator -> small loss
    assert float(discriminator_loss(real, fake)) < 0.2
    assert float(discriminator_loss(fake, real)) > 2.0
    assert float(generator_adversarial_loss(real)) < 0.2


def test_vqvae_roundtrip_and_losses():
    model = VQVAE(features=(4, 8), num_embeddings=16, embedding_dim=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["reconstruction"].shape == x.shape
    assert out["codes"].shape == (1, 4, 4)
    assert out["codes"].max() < 16
    assert float(out["commitment_loss"]) >= 0
