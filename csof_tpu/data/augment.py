"""Jittable data augmentation (the batchgenerators/MONAI replacement).

Capability parity with the reference's augmentation stack
(ref: nnunet/training/data_augmentation/default_data_augmentation.py:39-107
param dicts; data_augmentation_moreDA.py:96 `get_moreDA_augmentation`; V2
overrides rot ±30°, scale (0.7, 1.4), no elastic at
ref: nnUNetTrainerV2.py:355-405; video MONAI pipelines at
ref: dataset_loading.py `set_up_augmentation_pipeline`), re-designed as pure
jax functions: per-sample PRNG keys, probability gates via `where`, spatial
transforms as one fused affine warp — the whole batch augments ON DEVICE in
the train step instead of in worker processes.

Data layout: channels-last (B, H, W, C) images + (B, H, W) int segs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from csof_tpu.ops.warp import grid_sample, identity_grid


@dataclass(frozen=True)
class AugmentConfig:
    # spatial (ref: nnUNetTrainerV2.py:362-380)
    p_rotation: float = 0.2
    max_rotation: float = 30.0  # degrees
    p_scale: float = 0.2
    scale_range: tuple[float, float] = (0.7, 1.4)
    p_mirror: float = 0.5
    # intensity (ref: default_data_augmentation.py:39-107)
    p_noise: float = 0.1
    noise_max_sigma: float = 0.1
    p_blur: float = 0.2
    blur_sigma: tuple[float, float] = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness_range: tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: tuple[float, float] = (0.75, 1.25)
    p_gamma: float = 0.3
    gamma_range: tuple[float, float] = (0.7, 1.5)


def _bern(key, p):
    return jax.random.bernoulli(key, float(p))


def _affine_coords(h: int, w: int, angle, scale):
    """Rotation+scale about the center, as backward-map coords (H, W, 2)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    grid = identity_grid((h, w)) - jnp.array([cy, cx])
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[cos, -sin], [sin, cos]])
    coords = (grid @ rot.T) * scale
    return coords + jnp.array([cy, cx])


def _gauss_kernel(sigma, radius: int = 2):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def _separable_blur(img, sigma):
    """img: (H, W, C); fixed support radius 2, sigma traced."""
    k = _gauss_kernel(sigma)
    pad = 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    x = jnp.moveaxis(x, 0, -1)  # (W, C, H+4)
    x = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, k, mode="valid")))(x)
    x = jnp.moveaxis(x, -1, 0)
    y = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = jnp.moveaxis(y, 1, -1)  # (H, C, W+4)
    y = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, k, mode="valid")))(y)
    return jnp.moveaxis(y, -1, 1)


def augment_sample_2d(key, image: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """image: (H, W, C) float; seg: (H, W) int. Returns augmented pair."""
    h, w, _ = image.shape
    keys = jax.random.split(key, 12)

    # --- spatial: one fused affine (rotation + scale), applied to data with
    # bilinear and to seg with nearest sampling
    do_rot = _bern(keys[0], cfg.p_rotation)
    angle = jnp.where(
        do_rot, jax.random.uniform(keys[1], minval=-1.0, maxval=1.0) * jnp.deg2rad(cfg.max_rotation), 0.0
    )
    do_scale = _bern(keys[2], cfg.p_scale)
    scale = jnp.where(
        do_scale, jax.random.uniform(keys[3], minval=cfg.scale_range[0], maxval=cfg.scale_range[1]), 1.0
    )
    coords = _affine_coords(h, w, angle, scale)
    image = grid_sample(image, coords, mode="bilinear", padding="zeros")
    seg = grid_sample(seg[..., None].astype(jnp.float32), coords, mode="nearest", padding="zeros")[
        ..., 0
    ].astype(seg.dtype)

    # --- mirror (axis 1 = x, the reference mirrors all spatial axes w.p. 0.5)
    flip_y = _bern(keys[4], cfg.p_mirror)
    flip_x = _bern(keys[5], cfg.p_mirror)
    image = jnp.where(flip_y, jnp.flip(image, 0), image)
    seg = jnp.where(flip_y, jnp.flip(seg, 0), seg)
    image = jnp.where(flip_x, jnp.flip(image, 1), image)
    seg = jnp.where(flip_x, jnp.flip(seg, 1), seg)

    # --- intensity
    do_noise = _bern(keys[6], cfg.p_noise)
    sigma_n = jax.random.uniform(keys[7], maxval=cfg.noise_max_sigma)
    image = image + do_noise * jax.random.normal(keys[7], image.shape) * sigma_n

    do_blur = _bern(keys[8], cfg.p_blur)
    sigma_b = jax.random.uniform(keys[8], minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    image = jnp.where(do_blur, _separable_blur(image, sigma_b), image)

    do_bright = _bern(keys[9], cfg.p_brightness)
    factor = jax.random.uniform(keys[9], minval=cfg.brightness_range[0], maxval=cfg.brightness_range[1])
    image = jnp.where(do_bright, image * factor, image)

    do_contrast = _bern(keys[10], cfg.p_contrast)
    cf = jax.random.uniform(keys[10], minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1])
    mean = jnp.mean(image)
    image = jnp.where(do_contrast, (image - mean) * cf + mean, image)

    do_gamma = _bern(keys[11], cfg.p_gamma)
    gamma = jax.random.uniform(keys[11], minval=cfg.gamma_range[0], maxval=cfg.gamma_range[1])
    mn, mx = jnp.min(image), jnp.max(image)
    unit = (image - mn) / (mx - mn + 1e-8)
    image = jnp.where(do_gamma, unit ** gamma * (mx - mn) + mn, image)

    return image, seg


def augment_batch_2d(key, images: jnp.ndarray, segs: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """(B, H, W, C), (B, H, W) -> augmented batch (vmapped per-sample keys)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, im, sg: augment_sample_2d(k, im, sg, cfg))(keys, images, segs)


def augment_video(key, video: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """Consistent augmentation across a cine clip: ONE spatial/intensity draw
    applied to all frames (the MONAI video pipelines apply the same random
    transform per clip, ref: dataset_loading.py set_up_augmentation_pipeline).

    video: (T, H, W, C); seg: (T, H, W).
    """
    t, h, w, c = video.shape
    stacked = jnp.moveaxis(video, 0, -1).reshape(h, w, c * t)
    seg_stack = jnp.moveaxis(seg, 0, -1).astype(jnp.float32)  # (H, W, T)
    # reuse the sample pipeline with T folded into channels; seg handled as
    # extra "image" channels with nearest semantics via round-trip
    img_aug, _ = augment_sample_2d(key, stacked, jnp.zeros((h, w), jnp.int32), cfg)
    # apply the same *spatial* transform to seg: re-draw identical randomness
    keys = jax.random.split(key, 12)
    do_rot = _bern(keys[0], cfg.p_rotation)
    angle = jnp.where(do_rot, jax.random.uniform(keys[1], minval=-1.0, maxval=1.0) * jnp.deg2rad(cfg.max_rotation), 0.0)
    do_scale = _bern(keys[2], cfg.p_scale)
    scale = jnp.where(do_scale, jax.random.uniform(keys[3], minval=cfg.scale_range[0], maxval=cfg.scale_range[1]), 1.0)
    coords = _affine_coords(h, w, angle, scale)
    seg_aug = grid_sample(seg_stack, coords, mode="nearest", padding="zeros")
    flip_y = _bern(keys[4], cfg.p_mirror)
    flip_x = _bern(keys[5], cfg.p_mirror)
    seg_aug = jnp.where(flip_y, jnp.flip(seg_aug, 0), seg_aug)
    seg_aug = jnp.where(flip_x, jnp.flip(seg_aug, 1), seg_aug)
    video_out = jnp.moveaxis(img_aug.reshape(h, w, c, t), -1, 0)
    seg_out = jnp.moveaxis(seg_aug, -1, 0).astype(seg.dtype)
    return video_out, seg_out
