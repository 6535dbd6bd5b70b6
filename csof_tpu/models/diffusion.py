"""Denoising diffusion (DDPM) for cardiac MR image synthesis.

Capability parity with the reference's generative branch
(ref: nnunet/network_architecture/StableDiffusionModel.py:286 +
ControlNet/StableDiffusion trainers — the reference wraps HF diffusers for
image-generation experiments; here a self-contained DDPM: cosine noise
schedule, epsilon-prediction UNet with sinusoidal time embedding, and an
optional conditioning channel (segmentation map -> image, the ControlNet-ish
use), sampled with a `lax.scan` reverse loop).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from csof_tpu.models.blocks import ConvNormAct, upsample_linear


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jnp.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1)
    f = np.cos(((t / timesteps) + s) / (1 + s) * np.pi / 2) ** 2
    alpha_bar = f / f[0]
    betas = 1 - alpha_bar[1:] / alpha_bar[:-1]
    return jnp.asarray(np.clip(betas, 0, 0.999), jnp.float32)


@dataclass(frozen=True)
class DiffusionConfig:
    timesteps: int = 1000
    features: tuple[int, ...] = (32, 64, 128)
    time_dim: int = 64
    channels: int = 1
    cond_channels: int = 0  # e.g. one-hot seg for conditional synthesis


def time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class DenoiserUNet(nn.Module):
    cfg: DiffusionConfig

    @nn.compact
    def __call__(self, x, t, cond=None):
        """x: (N, H, W, C); t: (N,) int timesteps; cond: (N, H, W, Cc)."""
        cfg = self.cfg
        temb = nn.Dense(cfg.time_dim)(time_embedding(t, cfg.time_dim))
        temb = nn.Dense(cfg.time_dim)(nn.silu(temb))
        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        skips = []
        h = x
        for i, f in enumerate(cfg.features):
            stride = (2, 2) if i > 0 else (1, 1)
            h = ConvNormAct(f, (3, 3), strides=stride, norm="group")(h)
            h = h + nn.Dense(f)(nn.silu(temb))[:, None, None, :]
            h = ConvNormAct(f, (3, 3), norm="group")(h)
            skips.append(h)
        for i, f in enumerate(reversed(cfg.features[:-1])):
            h = upsample_linear(h, (2, 2))
            h = jnp.concatenate([h, skips[len(cfg.features) - 2 - i]], axis=-1)
            h = ConvNormAct(f, (3, 3), norm="group")(h)
            h = h + nn.Dense(f)(nn.silu(temb))[:, None, None, :]
        return nn.Conv(cfg.channels, (1, 1), kernel_init=nn.initializers.zeros)(h)


class DDPM:
    """Forward q-sampling, training loss, and ancestral sampling."""

    def __init__(self, model: DenoiserUNet, cfg: DiffusionConfig):
        self.model = model
        self.cfg = cfg
        betas = cosine_beta_schedule(cfg.timesteps)
        alphas = 1.0 - betas
        self.betas = betas
        self.alpha_bars = jnp.cumprod(alphas)
        self.alphas = alphas

    def q_sample(self, x0, t, noise):
        ab = self.alpha_bars[t][:, None, None, None]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * noise

    def loss(self, params, key, x0, cond=None):
        """Epsilon-prediction MSE (DDPM objective)."""
        k1, k2 = jax.random.split(key)
        t = jax.random.randint(k1, (x0.shape[0],), 0, self.cfg.timesteps)
        noise = jax.random.normal(k2, x0.shape)
        xt = self.q_sample(x0, t, noise)
        eps = self.model.apply(params, xt, t, cond)
        return jnp.mean((eps - noise) ** 2)

    def sample(self, params, key, shape, cond=None, steps: int | None = None):
        """Ancestral sampling via lax.scan over the reverse chain."""
        steps = steps or self.cfg.timesteps
        ts = jnp.linspace(self.cfg.timesteps - 1, 0, steps).astype(jnp.int32)

        def step(carry, t):
            x, k = carry
            k, ksub = jax.random.split(k)
            tvec = jnp.full((shape[0],), t)
            eps = self.model.apply(params, x, tvec, cond)
            beta = self.betas[t]
            alpha = self.alphas[t]
            ab = self.alpha_bars[t]
            mean = (x - beta / jnp.sqrt(1 - ab) * eps) / jnp.sqrt(alpha)
            noise = jax.random.normal(ksub, shape) * jnp.sqrt(beta)
            x = jnp.where(t > 0, mean + noise, mean)
            return (x, k), None

        k0, kinit = jax.random.split(key)
        x = jax.random.normal(kinit, shape)
        (x, _), _ = jax.lax.scan(step, (x, k0), ts)
        return x
