"""Jittable data augmentation (the batchgenerators/MONAI replacement).

Capability parity with the reference's augmentation stack
(ref: nnunet/training/data_augmentation/default_data_augmentation.py:39-107
param dicts; data_augmentation_moreDA.py:96-163 `get_moreDA_augmentation`
incl. SimulateLowResolutionTransform and the inverted-gamma GammaTransform;
V2 overrides rot ±30°, scale (0.7, 1.4), no elastic at
ref: nnUNetTrainerV2.py:355-405; video MONAI pipelines — RandFlip/Rotate/
Zoom/Affine-translate + RandRician/Gibbs/AdjustContrast/GaussianNoise/
Sharpen — at ref: dataset_loading.py:6348-6364 `set_up_augmentation_pipeline`),
re-designed as pure jax functions: per-sample PRNG keys, probability gates
via `where`, spatial transforms as one fused affine warp — the whole batch
augments ON DEVICE in the train step instead of in worker processes.

Data layout: channels-last (B, H, W, C) images + (B, H, W) int segs.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.ops.warp import grid_sample, identity_grid


@dataclass(frozen=True)
class AugmentConfig:
    # spatial (ref: nnUNetTrainerV2.py:362-380)
    p_rotation: float = 0.2
    max_rotation: float = 30.0  # degrees
    p_scale: float = 0.2
    scale_range: tuple[float, float] = (0.7, 1.4)
    p_mirror: float = 0.5
    p_translate: float = 0.0          # video RandAffined translate (ref: dataset_loading.py:6354)
    translate_range: float = 26.0     # pixels, uniform in ±range per axis
    # elastic deformation (ref: default_data_augmentation.py:43-46 do_elastic
    # with p_eldef=0.2; 2D alpha override at :98-99). The V2 recipe turns it
    # OFF (ref: nnUNetTrainerV2.py:373 do_elastic=False) so the default here
    # is 0; base-trainer pipelines get it via default_augment_config().
    p_elastic: float = 0.0
    elastic_alpha: tuple[float, float] = (0.0, 200.0)   # 2D default
    elastic_sigma: tuple[float, float] = (9.0, 13.0)
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
    gamma_retain_stats: bool = True   # ref: moreDA gamma_retain_stats
    # inverted gamma variant (ref: moreDA.py:157-163, p_per_sample=0.1)
    p_inverted_gamma: float = 0.1
    # low-resolution simulation (ref: moreDA.py:152-156 — zoom (0.5, 1)
    # nearest down / cubic up, per-channel 0.5, p_per_sample=0.25)
    p_lowres: float = 0.25
    lowres_zoom: tuple[float, float] = (0.5, 1.0)
    p_lowres_per_channel: float = 0.5
    lowres_levels: int = 8            # static zoom quantization (XLA shapes)
    # MRI pixel artifacts (video set, ref: dataset_loading.py:6358-6362;
    # off by default for the 2D nnU-Net recipe)
    p_rician: float = 0.0
    rician_std: float = 0.075
    p_gibbs: float = 0.0
    gibbs_alpha: tuple[float, float] = (0.45, 0.75)
    p_sharpen: float = 0.0
    sharpen_sigma1: tuple[float, float] = (0.1, 0.2)
    sharpen_sigma2: tuple[float, float] = (0.2, 0.4)
    sharpen_alpha: tuple[float, float] = (2.0, 3.0)


def video_augment_config() -> AugmentConfig:
    """The video loaders' MONAI envelope (ref: dataset_loading.py:6348-6364):
    flips/rot/zoom/translate at p=0.5 plus the MRI pixel set (Rician, Gibbs,
    contrast-gamma, gaussian noise, sharpen) at p=0.5. Low-res simulation is
    a batchgenerators (2D recipe) transform, not part of the MONAI set."""
    return AugmentConfig(
        p_rotation=0.5, max_rotation=180.0,
        p_scale=0.5, scale_range=(0.5, 1.5),
        p_mirror=0.5,
        p_translate=0.5, translate_range=26.0,
        p_noise=0.5, noise_max_sigma=0.04,
        p_blur=0.0,
        p_brightness=0.5, brightness_range=(0.8, 1.2),
        p_contrast=0.0,
        p_gamma=0.5, gamma_range=(0.7, 1.5), gamma_retain_stats=False,
        p_inverted_gamma=0.0,
        p_lowres=0.0,
        p_rician=0.5, rician_std=0.075,
        p_gibbs=0.5, gibbs_alpha=(0.45, 0.75),
        p_sharpen=0.5,
    )


def default_augment_config() -> AugmentConfig:
    """The BASE nnU-Net pipeline envelope (ref:
    default_data_augmentation.py:39-107 `default_2D_augmentation_params`):
    identical to the V2 envelope except elastic deformation is ON at
    p=0.2 (V2 disables it, ref: nnUNetTrainerV2.py:373; base nnUNetTrainer
    and several flow trainers run this default pipeline)."""
    return AugmentConfig(p_elastic=0.2)


def _bern(key, p):
    return jax.random.bernoulli(key, float(p))


_ELASTIC_RADIUS = 39  # static blur support: 3*sigma_max (sigma <= 13)


def _elastic_offset(key, h: int, w: int, alpha, sigma):
    """Backward-map displacement field for elastic deformation (H, W, 2):
    per-axis uniform(-1, 1) noise, gaussian-blurred with traced `sigma`,
    scaled by `alpha` — the batchgenerators `elastic_deform_coordinates`
    recipe (ref: default_data_augmentation.py:43-46 params), jittable: the
    blur is a static-support separable depthwise conv so XLA sees fixed
    shapes regardless of the drawn sigma."""
    noise = jax.random.uniform(key, (h, w, 2), minval=-1.0, maxval=1.0)
    k = _gauss_kernel(sigma, radius=_ELASTIC_RADIUS)
    r = _ELASTIC_RADIUS
    kern = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, 2))  # (2r+1, 1, 1, 2)
    x = noise[None]  # (1, H, W, 2)
    for axis in (1, 2):
        pad = [(0, 0)] * 4
        pad[axis] = (r, r)
        x = jnp.pad(x, pad, mode="reflect")
        x = jax.lax.conv_general_dilated(
            x,
            kern if axis == 1 else kern.reshape(1, -1, 1, 2),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2,
        )
    return x[0] * alpha


def _affine_coords(h: int, w: int, angle, scale, ty=0.0, tx=0.0, disp=None):
    """Rotation+scale about the center plus translation, as backward-map
    coordinates (H, W, 2). `disp` (H, W, 2) is an elastic displacement
    added to the centered grid BEFORE rotation/scale — batchgenerators
    order (SpatialTransform deforms the coordinate map first, then
    rotates/scales it)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    grid = identity_grid((h, w)) - jnp.array([cy, cx])
    if disp is not None:
        grid = grid + disp
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[cos, -sin], [sin, cos]])
    coords = (grid @ rot.T) * scale
    return coords + jnp.stack([cy - ty, cx - tx])


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


# ---------------------------------------------------------------------------
# Individual intensity transforms
# ---------------------------------------------------------------------------


def gamma_transform(key, image, gamma_range=(0.7, 1.5), invert=False, retain_stats=True):
    """batchgenerators augment_gamma semantics (ref: moreDA.py:157-163 via
    GammaTransform): bimodal gamma draw (half the time from (lo, 1), half
    from (1, hi)), applied on the min-max normalized image; optional
    intensity inversion around the transform (`invert_image=True` — the
    "inverted gamma" moreDA always enables at p=0.1) and mean/std
    restoration (`retain_stats`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if invert:
        image = -image
    mu, sd = jnp.mean(image), jnp.std(image)
    lo = jax.random.uniform(k2, minval=gamma_range[0], maxval=1.0)
    hi = jax.random.uniform(k3, minval=1.0, maxval=gamma_range[1])
    gamma = jnp.where(_bern(k1, 0.5) & (gamma_range[0] < 1), lo, hi)
    mn, mx = jnp.min(image), jnp.max(image)
    rng = mx - mn
    out = ((image - mn) / (rng + 1e-7)) ** gamma * rng + mn
    if retain_stats:
        out = (out - jnp.mean(out)) / (jnp.std(out) + 1e-8) * sd + mu
    if invert:
        out = -out
    return out


def simulate_low_resolution(key, image, zoom_range=(0.5, 1.0), p_per_channel=0.5, levels=8):
    """SimulateLowResolutionTransform (ref: moreDA.py:152-156): per channel,
    with probability `p_per_channel`, downsample by a random zoom with
    nearest interpolation (order 0) and upsample back with cubic (order 3).

    XLA needs static shapes, so the continuous zoom draw is quantized to
    `levels` static factors dispatched by lax.switch — same artifact family
    (aliasing + interpolation blur), compile-time bounded."""
    h, w, c = image.shape
    zooms = np.linspace(zoom_range[0], zoom_range[1], levels)

    def make_branch(z):
        lh, lw = max(1, round(z * h)), max(1, round(z * w))

        def f(ch):  # (H, W)
            low = jax.image.resize(ch, (lh, lw), method="nearest")
            return jax.image.resize(low, (h, w), method="cubic")

        return f

    branches = [make_branch(z) for z in zooms]

    def per_channel(k, ch):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (), 0, levels)
        out = jax.lax.switch(idx, branches, ch)
        return jnp.where(_bern(k2, p_per_channel), out, ch)

    keys = jax.random.split(key, c)
    return jax.vmap(per_channel, in_axes=(0, 2), out_axes=2)(keys, image)


def rician_noise(key, image, std=0.075):
    """RandRicianNoise (ref: dataset_loading.py:6358): MRI magnitude noise —
    out = sqrt((x + n1)^2 + n2^2), n1/n2 ~ N(0, s) with s ~ U(0, std)
    (MONAI sample_std=True default). Sign-preserving for z-scored inputs
    (the magnitude is applied around the actual value)."""
    k1, k2, k3 = jax.random.split(key, 3)
    s = jax.random.uniform(k1, maxval=std)
    n1 = jax.random.normal(k2, image.shape) * s
    n2 = jax.random.normal(k3, image.shape) * s
    return jnp.sign(image + n1) * jnp.sqrt((image + n1) ** 2 + n2**2)


def gibbs_artifact(key, image, alpha_range=(0.45, 0.75)):
    """RandGibbsNoise (ref: dataset_loading.py:6359): k-space truncation
    ringing. The 2D FFT of each channel is attenuated by a radial low-pass
    exp(-q * d^2) where d is the normalized distance from the k-space center
    and q grows with alpha in [0, 1] (alpha=0 -> identity, alpha->1 ->
    severe truncation), then inverse-transformed. Same artifact family as
    MONAI's GibbsNoise (smooth high-frequency suppression -> Gibbs ringing
    at edges) with a jit-friendly closed form."""
    h, w, _ = image.shape
    alpha = jax.random.uniform(key, minval=alpha_range[0], maxval=alpha_range[1])
    fy = jnp.fft.fftfreq(h)[:, None]  # cycles/pixel in [-0.5, 0.5)
    fx = jnp.fft.fftfreq(w)[None, :]
    d2 = (fy / 0.5) ** 2 + (fx / 0.5) ** 2  # normalized squared radius
    q = 10.0 * alpha / jnp.maximum(1.0 - alpha, 1e-3)
    mask = jnp.exp(-q * d2)[..., None]
    k = jnp.fft.fft2(image, axes=(0, 1))
    out = jnp.fft.ifft2(k * mask, axes=(0, 1)).real
    return out.astype(image.dtype)


def gaussian_sharpen(key, image, sigma1=(0.1, 0.2), sigma2=(0.2, 0.4), alpha=(2.0, 3.0)):
    """RandGaussianSharpen (ref: dataset_loading.py:6361): unsharp masking —
    b1 = G_s1(x), b2 = G_s2(b1), out = b1 + a * (b1 - b2)."""
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = jax.random.uniform(k1, minval=sigma1[0], maxval=sigma1[1])
    s2 = jax.random.uniform(k2, minval=sigma2[0], maxval=sigma2[1])
    a = jax.random.uniform(k3, minval=alpha[0], maxval=alpha[1])
    b1 = _separable_blur(image, s1)
    b2 = _separable_blur(b1, s2)
    return b1 + a * (b1 - b2)


# ---------------------------------------------------------------------------
# Fused per-sample pipelines
# ---------------------------------------------------------------------------


def _spatial_draw(key, h: int, w: int, cfg: AugmentConfig):
    """One random draw of the fused affine + mirror parameters, shared
    between the image/seg pair (and, for video, every frame)."""
    keys = jax.random.split(key, 12)
    do_rot = _bern(keys[0], cfg.p_rotation)
    angle = jnp.where(
        do_rot,
        jax.random.uniform(keys[1], minval=-1.0, maxval=1.0) * jnp.deg2rad(cfg.max_rotation),
        0.0,
    )
    do_scale = _bern(keys[2], cfg.p_scale)
    scale = jnp.where(
        do_scale,
        jax.random.uniform(keys[3], minval=cfg.scale_range[0], maxval=cfg.scale_range[1]),
        1.0,
    )
    do_trans = _bern(keys[4], cfg.p_translate) if cfg.p_translate > 0 else jnp.bool_(False)
    r = float(cfg.translate_range)
    ty = jnp.where(do_trans, jax.random.uniform(keys[5], minval=-r, maxval=r), 0.0)
    tx = jnp.where(do_trans, jax.random.uniform(keys[6], minval=-r, maxval=r), 0.0)
    disp = None
    if cfg.p_elastic > 0:
        do_el = _bern(keys[9], cfg.p_elastic)
        alpha = jax.random.uniform(
            keys[10], minval=cfg.elastic_alpha[0], maxval=cfg.elastic_alpha[1]
        )
        k_sig, k_field = jax.random.split(keys[11])
        sigma = jax.random.uniform(
            k_sig, minval=cfg.elastic_sigma[0], maxval=cfg.elastic_sigma[1]
        )
        disp = jnp.where(do_el, 1.0, 0.0) * _elastic_offset(k_field, h, w, alpha, sigma)
    coords = _affine_coords(h, w, angle, scale, ty, tx, disp)
    flip_y = _bern(keys[7], cfg.p_mirror)
    flip_x = _bern(keys[8], cfg.p_mirror)
    return coords, flip_y, flip_x


def _apply_spatial(image, coords, flip_y, flip_x, mode: str):
    out = grid_sample(image, coords, mode=mode, padding="zeros")
    out = jnp.where(flip_y, jnp.flip(out, 0), out)
    out = jnp.where(flip_x, jnp.flip(out, 1), out)
    return out


def _apply_intensity(key, image, cfg: AugmentConfig):
    # Each transform gets TWO independent subkeys: one for the Bernoulli
    # gate, one for its internal parameter/noise draws. Sharing a key for
    # both (round-3 ADVICE) correlates WHETHER a transform fires with WHICH
    # parameters it uses, narrowing the effective augmentation distribution.
    gates, draws = [], []
    for k in jax.random.split(key, 10):
        g, d = jax.random.split(k)
        gates.append(g)
        draws.append(d)

    do_noise = _bern(gates[0], cfg.p_noise)
    k_sigma, k_field = jax.random.split(draws[0])
    sigma_n = jax.random.uniform(k_sigma, maxval=cfg.noise_max_sigma)
    image = image + do_noise * jax.random.normal(k_field, image.shape) * sigma_n

    do_blur = _bern(gates[1], cfg.p_blur)
    sigma_b = jax.random.uniform(draws[1], minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    image = jnp.where(do_blur, _separable_blur(image, sigma_b), image)

    do_bright = _bern(gates[2], cfg.p_brightness)
    factor = jax.random.uniform(draws[2], minval=cfg.brightness_range[0], maxval=cfg.brightness_range[1])
    image = jnp.where(do_bright, image * factor, image)

    do_contrast = _bern(gates[3], cfg.p_contrast)
    cf = jax.random.uniform(draws[3], minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1])
    mean = jnp.mean(image)
    image = jnp.where(do_contrast, (image - mean) * cf + mean, image)

    if cfg.p_lowres > 0:
        image = jnp.where(
            _bern(gates[4], cfg.p_lowres),
            simulate_low_resolution(
                draws[4], image, cfg.lowres_zoom, cfg.p_lowres_per_channel, cfg.lowres_levels
            ),
            image,
        )

    if cfg.p_inverted_gamma > 0:
        image = jnp.where(
            _bern(gates[5], cfg.p_inverted_gamma),
            gamma_transform(draws[5], image, cfg.gamma_range, invert=True,
                            retain_stats=cfg.gamma_retain_stats),
            image,
        )

    do_gamma = _bern(gates[6], cfg.p_gamma)
    image = jnp.where(
        do_gamma,
        gamma_transform(draws[6], image, cfg.gamma_range, invert=False,
                        retain_stats=cfg.gamma_retain_stats),
        image,
    )

    if cfg.p_rician > 0:
        image = jnp.where(
            _bern(gates[7], cfg.p_rician), rician_noise(draws[7], image, cfg.rician_std), image
        )
    if cfg.p_gibbs > 0:
        image = jnp.where(
            _bern(gates[8], cfg.p_gibbs), gibbs_artifact(draws[8], image, cfg.gibbs_alpha), image
        )
    if cfg.p_sharpen > 0:
        image = jnp.where(
            _bern(gates[9], cfg.p_sharpen),
            gaussian_sharpen(draws[9], image, cfg.sharpen_sigma1, cfg.sharpen_sigma2, cfg.sharpen_alpha),
            image,
        )
    return image


def augment_sample_2d(key, image: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """image: (H, W, C) float; seg: (H, W) int. Returns augmented pair."""
    h, w, _ = image.shape
    k_spatial, k_pixel = jax.random.split(key)
    coords, flip_y, flip_x = _spatial_draw(k_spatial, h, w, cfg)
    image = _apply_spatial(image, coords, flip_y, flip_x, "bilinear")
    seg = _apply_spatial(seg[..., None].astype(jnp.float32), coords, flip_y, flip_x, "nearest")[
        ..., 0
    ].astype(seg.dtype)
    image = _apply_intensity(k_pixel, image, cfg)
    return image, seg


def augment_batch_2d(key, images: jnp.ndarray, segs: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """(B, H, W, C), (B, H, W) -> augmented batch (vmapped per-sample keys)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, im, sg: augment_sample_2d(k, im, sg, cfg))(keys, images, segs)


def augment_video(key, video: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig | None = None):
    """Consistent augmentation across a cine clip: ONE spatial/intensity draw
    applied to all frames (the MONAI video pipelines apply the same random
    transform per clip, ref: dataset_loading.py set_up_augmentation_pipeline).

    video: (T, H, W, C); seg: (T, H, W). Defaults to the video envelope
    (`video_augment_config`) with clip-scale spatial params (the 2D ±30°/0.7-
    1.4 envelope, translation off) kept for training-distribution continuity.
    """
    if cfg is None:
        cfg = replace(
            video_augment_config(),
            p_rotation=0.2, max_rotation=30.0, p_scale=0.2, scale_range=(0.7, 1.4),
            p_translate=0.0,
        )
    t, h, w, c = video.shape
    k_spatial, k_pixel = jax.random.split(key)
    coords, flip_y, flip_x = _spatial_draw(k_spatial, h, w, cfg)
    stacked = jnp.moveaxis(video, 0, -1).reshape(h, w, c * t)
    seg_stack = jnp.moveaxis(seg, 0, -1).astype(jnp.float32)  # (H, W, T)
    img_aug = _apply_spatial(stacked, coords, flip_y, flip_x, "bilinear")
    seg_aug = _apply_spatial(seg_stack, coords, flip_y, flip_x, "nearest")
    img_aug = _apply_intensity(k_pixel, img_aug, cfg)
    video_out = jnp.moveaxis(img_aug.reshape(h, w, c, t), -1, 0)
    seg_out = jnp.moveaxis(seg_aug, -1, 0).astype(seg.dtype)
    return video_out, seg_out
