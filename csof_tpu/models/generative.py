"""Generative extras: latent diffusion, ControlNet-style conditioning, and a
swin GAN (the reference's experimental generative branch).

Capability parity with:
- ref: nnunet/training/network_training/nnMTLTrainerV2Flow_StableDiffusion.py
  (:1226-1246 — VAE-encode images to latents, DDPM-noise them, predict the
  noise with a UNet, MSE loss). The reference wraps HuggingFace diffusers
  pretrained AutoencoderKL/CLIP assets that do not exist in this image; here
  the latent space comes from a self-contained KL autoencoder trained on the
  same cardiac data.
- ref: nnunet/training/network_training/nnMTLTrainerV2Flow_ControlNet.py
  (:489-545 — ControlNetModel: a trainable copy of the denoiser's encoder
  fed a conditioning hint, injected into the FROZEN base denoiser through
  zero-initialized convolutions).
- ref: nnunet/lib/swin_gan.py + nnunet/lib/gan_model.py (swin-block
  generator/discriminator pair).

TPU-first notes: everything is jittable; sampling loops are `lax.scan`; the
swin generator upsamples with pixel-shuffle-free bilinear + conv (no
transposed convs, which lower poorly on TPU).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.models.blocks import ConvNormAct, upsample_linear
from csof_tpu.models.diffusion import DDPM, DenoiserUNet, DiffusionConfig, time_embedding
from csof_tpu.models.swin import PatchMerging, SwinStage


# ---------------------------------------------------------------------------
# KL autoencoder (AutoencoderKL stand-in) + latent diffusion
# ---------------------------------------------------------------------------


class KLAutoencoder(nn.Module):
    """Small conv VAE: encoder -> (mu, logvar) -> decoder
    (the role diffusers' pretrained AutoencoderKL plays for the reference,
    ref: nnMTLTrainerV2Flow_ControlNet.py:590 `self.vae.encode(...)
    .latent_dist.sample()`)."""

    features: Sequence[int] = (32, 64)
    latent_dim: int = 4

    def setup(self):
        self.enc_blocks = [
            ConvNormAct(f, (4, 4), strides=(2, 2), norm="group", name=f"enc_{i}")
            for i, f in enumerate(self.features)
        ]
        self.to_moments = nn.Conv(2 * self.latent_dim, (1, 1), name="moments")
        self.dec_blocks = [
            ConvNormAct(f, (3, 3), norm="group", name=f"dec_{i}")
            for i, f in enumerate(reversed(self.features))
        ]
        self.to_image = nn.Conv(1, (1, 1), name="out")

    def encode(self, x: jnp.ndarray):
        """x: (N, H, W, 1) -> (mu, logvar), each (N, H/2^k, W/2^k, latent)."""
        h = x
        for blk in self.enc_blocks:
            h = blk(h)
        moments = self.to_moments(h)
        return moments[..., : self.latent_dim], moments[..., self.latent_dim :]

    def decode(self, z: jnp.ndarray):
        h = z
        for blk in self.dec_blocks:
            h = upsample_linear(h, (2, 2))
            h = blk(h)
        return self.to_image(h)

    def __call__(self, x: jnp.ndarray, rng: jnp.ndarray):
        mu, logvar = self.encode(x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        recon = self.decode(z)
        kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
        return {"reconstruction": recon, "mu": mu, "logvar": logvar, "kl": kl}


class LatentDiffusion:
    """DDPM over the KL autoencoder's latent space
    (ref: nnMTLTrainerV2Flow_StableDiffusion.py run_iteration_train — encode,
    scale, add noise at a random timestep, predict the noise, MSE)."""

    def __init__(
        self,
        ae: KLAutoencoder,
        denoiser_cfg: DiffusionConfig,
        scaling_factor: float = 1.0,
    ):
        self.ae = ae
        self.denoiser = DenoiserUNet(denoiser_cfg)
        self.ddpm = DDPM(self.denoiser, denoiser_cfg)
        self.scaling_factor = scaling_factor

    def encode_latents(self, ae_params, key, x):
        """Sampled, scaled latents with gradients stopped (the VAE is frozen
        during diffusion training, like the reference's pretrained one)."""
        mu, logvar = self.ae.apply(ae_params, x, method=KLAutoencoder.encode)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return jax.lax.stop_gradient(z * self.scaling_factor)

    def loss(self, denoiser_params, ae_params, key, x, cond=None):
        k_enc, k_ddpm = jax.random.split(key)
        latents = self.encode_latents(ae_params, k_enc, x)
        return self.ddpm.loss(denoiser_params, k_ddpm, latents, cond)

    def sample(self, denoiser_params, ae_params, key, latent_shape, cond=None, steps=None):
        z = self.ddpm.sample(denoiser_params, key, latent_shape, cond, steps)
        return self.ae.apply(ae_params, z / self.scaling_factor, method=KLAutoencoder.decode)


# ---------------------------------------------------------------------------
# ControlNet-style conditioning
# ---------------------------------------------------------------------------


class ControlledDenoiserUNet(nn.Module):
    """Denoiser UNet + a trainable control branch injected via zero convs
    (ref: ControlNetModel built at nnMTLTrainerV2Flow_ControlNet.py:499;
    ControlNet recipe: the control branch mirrors the encoder, consumes a
    hint image, and its per-level outputs are added to the frozen base
    encoder's skips through zero-initialized 1x1 convs, so training starts
    as an exact no-op on the base model).

    Params are grouped under 'base' and 'control' submodule scopes so the
    base can be frozen with `controlnet_param_labels` + optax.multi_transform.
    """

    cfg: DiffusionConfig

    @nn.compact
    def __call__(self, x, t, hint):
        """x: (N, h, w, C) noisy input; t: (N,); hint: (N, h*s, w*s, Ch)
        conditioning image (resized to x's resolution internally)."""
        cfg = self.cfg
        temb = nn.Dense(cfg.time_dim, name="base_time0")(time_embedding(t, cfg.time_dim))
        temb = nn.Dense(cfg.time_dim, name="base_time1")(nn.silu(temb))

        # control branch: hint encoder mirroring the base encoder geometry
        if hint.shape[1:3] != x.shape[1:3]:
            hint = jax.image.resize(
                hint, (hint.shape[0], *x.shape[1:3], hint.shape[-1]), "linear"
            )
        c = jnp.concatenate([x, hint], axis=-1)
        controls = []
        for i, f in enumerate(cfg.features):
            stride = (2, 2) if i > 0 else (1, 1)
            c = ConvNormAct(f, (3, 3), strides=stride, norm="group", name=f"control_enc_{i}")(c)
            c = c + nn.Dense(f, name=f"control_temb_{i}")(nn.silu(temb))[:, None, None, :]
            # zero conv: injection starts as identity on the base
            controls.append(
                nn.Conv(f, (1, 1), kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name=f"control_zero_{i}")(c)
            )

        # base UNet (same wiring as DenoiserUNet) with control residuals
        skips = []
        h = x
        for i, f in enumerate(cfg.features):
            stride = (2, 2) if i > 0 else (1, 1)
            h = ConvNormAct(f, (3, 3), strides=stride, norm="group", name=f"base_enc_{i}")(h)
            h = h + nn.Dense(f, name=f"base_temb_{i}")(nn.silu(temb))[:, None, None, :]
            h = ConvNormAct(f, (3, 3), norm="group", name=f"base_enc2_{i}")(h)
            h = h + controls[i]
            skips.append(h)
        for i, f in enumerate(reversed(cfg.features[:-1])):
            h = upsample_linear(h, (2, 2))
            h = jnp.concatenate([h, skips[len(cfg.features) - 2 - i]], axis=-1)
            h = ConvNormAct(f, (3, 3), norm="group", name=f"base_dec_{i}")(h)
            h = h + nn.Dense(f, name=f"base_dec_temb_{i}")(nn.silu(temb))[:, None, None, :]
        # NOTE: unlike DenoiserUNet, base_out is NOT zero-init: the base here
        # stands for a pretrained denoiser (in practice its params are
        # loaded, then frozen) — a zero out-conv would block all gradient to
        # the control branch since the base never trains.
        return nn.Conv(cfg.channels, (1, 1), name="base_out")(h)


def controlnet_param_labels(params) -> dict:
    """Label pytree for optax.multi_transform: 'control' for the trainable
    control branch, 'frozen' for the base UNet (the ControlNet recipe —
    ref trainer freezes the pretrained denoiser and trains only the control
    branch)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        k: ("control" if any(str(p).startswith("control") for p in k) else "frozen")
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


def controlnet_loss(model: ControlledDenoiserUNet, ddpm: DDPM):
    """DDPM epsilon-MSE with the hint image as conditioning."""

    def loss_fn(params, key, x0, hint):
        k1, k2 = jax.random.split(key)
        t = jax.random.randint(k1, (x0.shape[0],), 0, ddpm.cfg.timesteps)
        noise = jax.random.normal(k2, x0.shape)
        xt = ddpm.q_sample(x0, t, noise)
        eps = model.apply(params, xt, t, hint)
        return jnp.mean((eps - noise) ** 2)

    return loss_fn


# ---------------------------------------------------------------------------
# Swin GAN
# ---------------------------------------------------------------------------


class SwinGenerator(nn.Module):
    """Latent vector -> image through swin-block upsampling stages
    (ref: nnunet/lib/swin_gan.py BasicLayerUp used by Generator2,
    lib/training_utils.py:524)."""

    features: Sequence[int] = (128, 64, 32)  # coarse -> fine
    base_hw: int = 8
    num_heads: int = 4
    window: int = 4
    out_channels: int = 1
    depth: int = 1

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        """z: (N, latent) -> (N, base_hw * 2^len(features), ..., C)."""
        n = z.shape[0]
        f0 = self.features[0]
        h = nn.Dense(self.base_hw * self.base_hw * f0)(z)
        h = h.reshape(n, self.base_hw, self.base_hw, f0)
        for i, f in enumerate(self.features):
            if i > 0:
                h = upsample_linear(h, (2, 2))
                h = nn.Conv(f, (3, 3), padding="SAME")(h)
            h = jax.vmap(
                SwinStage(f, self.depth * 2, self.num_heads, self.window,
                          name=f"stage_{i}")
            )(h)
        h = upsample_linear(h, (2, 2))
        return nn.tanh(nn.Conv(self.out_channels, (3, 3), padding="SAME")(h))


class SwinDiscriminator(nn.Module):
    """Image -> real/fake logits via swin stages + patch merging
    (ref: nnunet/lib/swin_gan.py BasicLayer used by the Discriminator,
    lib/training_utils.py:523)."""

    features: Sequence[int] = (32, 64, 128)
    num_heads: int = 4
    window: int = 4
    depth: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = nn.Conv(self.features[0], (3, 3), strides=(2, 2), padding="SAME")(x)
        for i, f in enumerate(self.features):
            h = jax.vmap(
                SwinStage(f, self.depth * 2, self.num_heads, self.window,
                          name=f"stage_{i}")
            )(h)
            if i < len(self.features) - 1:
                h = jax.vmap(PatchMerging(self.features[i + 1], name=f"merge_{i}"))(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(1)(h)[..., 0]
