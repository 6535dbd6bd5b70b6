"""Training steps for the generative extras (experimental branch parity).

Mirrors the reference's StableDiffusion / ControlNet / GAN trainers at the
capability level (ref: nnunet/training/network_training/
nnMTLTrainerV2Flow_StableDiffusion.py:1180-1246 run_iteration_train;
nnMTLTrainerV2Flow_ControlNet.py; lib/train_gan.py adversarial loop), built
as pure jitted step functions over optax states — the TPU-native shape of
those training loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from csof_tpu.models.discriminator import (
    discriminator_loss,
    generator_adversarial_loss,
)
from csof_tpu.models.generative import (
    ControlledDenoiserUNet,
    LatentDiffusion,
    controlnet_loss,
    controlnet_param_labels,
)


def make_ldm_train_step(ldm: LatentDiffusion, tx: optax.GradientTransformation):
    """Latent-diffusion step: epsilon-MSE on frozen-VAE latents
    (ref: nnMTLTrainerV2Flow_StableDiffusion.py:1226-1246), grad-clip 12 +
    optimizer update like every trainer in the reference."""

    @jax.jit
    def step(params, opt_state, ae_params, key, batch):
        loss, grads = jax.value_and_grad(
            lambda p: ldm.loss(p, ae_params, key, batch)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_controlnet_optimizer(params, lr: float = 1e-4) -> tuple:
    """optax.multi_transform freezing the base UNet and training only the
    control branch (the ControlNet recipe; the reference freezes its
    pretrained denoiser via requires_grad, ref ControlNet trainer
    `feature_extractor` path :612-618)."""
    tx = optax.multi_transform(
        {
            "control": optax.chain(optax.clip_by_global_norm(12.0), optax.adamw(lr)),
            "frozen": optax.set_to_zero(),
        },
        controlnet_param_labels(params),
    )
    return tx, tx.init(params)


def make_controlnet_train_step(model: ControlledDenoiserUNet, ddpm, tx):
    loss_fn = controlnet_loss(model, ddpm)

    @jax.jit
    def step(params, opt_state, key, x0, hint):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, key, x0, hint))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_gan_train_steps(
    generator, discriminator, g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
):
    """Alternating non-saturating GAN steps (ref: lib/train_gan.py loop;
    swin generator/discriminator built at lib/training_utils.py:523-524)."""

    @jax.jit
    def d_step(d_params, d_opt, g_params, key, real):
        z = jax.random.normal(key, (real.shape[0], generator.features[0]))
        fake = jax.lax.stop_gradient(generator.apply(g_params, z))

        def loss_fn(dp):
            return discriminator_loss(
                discriminator.apply(dp, real), discriminator.apply(dp, fake)
            )

        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, d_opt = d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, loss

    @functools.partial(jax.jit, static_argnums=4)
    def g_step(g_params, g_opt, d_params, key, batch_size):
        z = jax.random.normal(key, (batch_size, generator.features[0]))

        def loss_fn(gp):
            fake = generator.apply(gp, z)
            return generator_adversarial_loss(discriminator.apply(d_params, fake))

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        updates, g_opt = g_tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, loss

    return d_step, g_step
