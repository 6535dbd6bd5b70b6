"""On-device augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.data.augment import (
    AugmentConfig,
    augment_batch_2d,
    augment_sample_2d,
    augment_video,
)


def _blob(h=24, w=24):
    img = np.zeros((h, w, 1), np.float32)
    seg = np.zeros((h, w), np.int32)
    img[8:16, 8:16, 0] = 1.0
    seg[8:16, 8:16] = 2
    return jnp.asarray(img), jnp.asarray(seg)


def test_identity_when_probs_zero():
    cfg = AugmentConfig(
        p_rotation=0, p_scale=0, p_mirror=0, p_noise=0, p_blur=0,
        p_brightness=0, p_contrast=0, p_gamma=0, p_lowres=0,
        p_inverted_gamma=0, p_rician=0, p_gibbs=0, p_sharpen=0, p_translate=0,
    )
    img, seg = _blob()
    out_img, out_seg = augment_sample_2d(jax.random.PRNGKey(0), img, seg, cfg)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_seg), np.asarray(seg))


def test_seg_labels_preserved_under_spatial():
    cfg = AugmentConfig(p_rotation=1.0, p_scale=1.0, p_mirror=0.5)
    img, seg = _blob()
    for i in range(5):
        _, out_seg = augment_sample_2d(jax.random.PRNGKey(i), img, seg, cfg)
        assert set(np.unique(np.asarray(out_seg))) <= {0, 2}


def test_batch_augment_varies_per_sample():
    cfg = AugmentConfig(p_rotation=1.0, p_scale=1.0)
    img, seg = _blob()
    imgs = jnp.stack([img] * 4)
    segs = jnp.stack([seg] * 4)
    out, _ = augment_batch_2d(jax.random.PRNGKey(0), imgs, segs, cfg)
    out = np.asarray(out)
    # different per-sample keys -> different transforms
    assert not np.allclose(out[0], out[1])


def test_simulate_low_resolution_loses_high_freq():
    """moreDA:152 SimulateLowResolutionTransform: nearest-down + cubic-up
    must suppress high-frequency content while keeping shape/dtype."""
    from csof_tpu.data.augment import simulate_low_resolution

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 32, 1).astype(np.float32))
    out = simulate_low_resolution(
        jax.random.PRNGKey(1), img, zoom_range=(0.5, 0.5), p_per_channel=1.0, levels=1
    )
    assert out.shape == img.shape
    # total variation (a high-frequency proxy) drops after down-up sampling
    def tv(x):
        return float(jnp.abs(jnp.diff(x[..., 0], axis=0)).sum() + jnp.abs(jnp.diff(x[..., 0], axis=1)).sum())
    assert tv(out) < tv(img)
    # p_per_channel=0 -> untouched
    out0 = simulate_low_resolution(jax.random.PRNGKey(1), img, p_per_channel=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img))


def test_gamma_transform_retain_stats_and_invert():
    from csof_tpu.data.augment import gamma_transform

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(24, 24, 1).astype(np.float32))
    out = gamma_transform(jax.random.PRNGKey(0), img, (0.7, 1.5), invert=False, retain_stats=True)
    # retain_stats restores mean/std (moreDA gamma_retain_stats=True)
    assert float(jnp.mean(out)) == pytest.approx(float(jnp.mean(img)), abs=1e-3)
    assert float(jnp.std(out)) == pytest.approx(float(jnp.std(img)), abs=1e-3)
    assert not np.allclose(np.asarray(out), np.asarray(img))
    # inverted gamma differs from plain gamma on an asymmetric image
    out_inv = gamma_transform(jax.random.PRNGKey(0), img, (0.7, 1.5), invert=True, retain_stats=True)
    assert not np.allclose(np.asarray(out_inv), np.asarray(out))


def test_rician_gibbs_sharpen():
    from csof_tpu.data.augment import gaussian_sharpen, gibbs_artifact, rician_noise

    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(32, 32, 1).astype(np.float32))
    ric = rician_noise(jax.random.PRNGKey(0), img, std=0.075)
    assert ric.shape == img.shape and not np.allclose(np.asarray(ric), np.asarray(img))

    gib = gibbs_artifact(jax.random.PRNGKey(1), img, (0.6, 0.6))
    assert gib.shape == img.shape
    # k-space low-pass: high-frequency energy strictly drops
    hf = lambda x: float(np.abs(np.diff(np.asarray(x)[..., 0], axis=1)).mean())
    assert hf(gib) < hf(img)
    # stronger alpha -> smoother
    gib_strong = gibbs_artifact(jax.random.PRNGKey(1), img, (0.75, 0.75))
    assert hf(gib_strong) < hf(gib)

    smooth = jnp.asarray(np.outer(np.hanning(32), np.hanning(32)).astype(np.float32))[..., None]
    sharp = gaussian_sharpen(jax.random.PRNGKey(2), smooth)
    assert sharp.shape == smooth.shape
    # unsharp masking amplifies local contrast
    assert float(jnp.max(sharp) - jnp.min(sharp)) > float(jnp.max(smooth) - jnp.min(smooth)) * 0.99


def test_translate_affine_moves_content():
    cfg = AugmentConfig(
        p_rotation=0, p_scale=0, p_mirror=0, p_noise=0, p_blur=0,
        p_brightness=0, p_contrast=0, p_gamma=0, p_lowres=0,
        p_inverted_gamma=0, p_translate=1.0, translate_range=6.0,
    )
    img, seg = _blob()
    moved = False
    for i in range(5):
        out_img, out_seg = augment_sample_2d(jax.random.PRNGKey(i), img, seg, cfg)
        assert set(np.unique(np.asarray(out_seg))) <= {0, 2}
        if not np.allclose(np.asarray(out_img), np.asarray(img), atol=1e-5):
            moved = True
    assert moved


def test_video_augment_config_envelope():
    from csof_tpu.data.augment import video_augment_config

    cfg = video_augment_config()
    assert cfg.p_rician == 0.5 and cfg.p_gibbs == 0.5 and cfg.p_sharpen == 0.5
    assert cfg.p_translate == 0.5 and cfg.translate_range == 26.0
    # video default path runs (MRI pixel set live)
    img, seg = _blob()
    video = jnp.stack([img, img])
    segs = jnp.stack([seg, seg])
    v_out, s_out = augment_video(jax.random.PRNGKey(0), video, segs, cfg)
    assert v_out.shape == video.shape and s_out.shape == segs.shape


def test_video_consistent_across_frames():
    cfg = AugmentConfig(
        p_rotation=0, p_scale=0, p_mirror=1.0, p_noise=0, p_blur=0,
        p_brightness=0, p_contrast=0, p_gamma=0,
    )
    img, seg = _blob()
    video = jnp.stack([img, img, img])
    segs = jnp.stack([seg, seg, seg])
    v_out, s_out = augment_video(jax.random.PRNGKey(3), video, segs, cfg)
    v_out = np.asarray(v_out)
    # all frames got the SAME flip
    np.testing.assert_allclose(v_out[0], v_out[1], atol=1e-6)
    np.testing.assert_allclose(v_out[1], v_out[2], atol=1e-6)
    # and seg matches the image transform
    s0 = np.asarray(s_out[0])
    assert (s0[v_out[0, ..., 0] > 0.5] == 2).all()


def _zeroed(**kw):
    base = dict(
        p_rotation=0, p_scale=0, p_mirror=0, p_noise=0, p_blur=0,
        p_brightness=0, p_contrast=0, p_gamma=0, p_lowres=0,
        p_inverted_gamma=0, p_rician=0, p_gibbs=0, p_sharpen=0, p_translate=0,
    )
    base.update(kw)
    return AugmentConfig(**base)


def test_elastic_deforms_image_and_seg_consistently():
    # elastic ON with a strong guaranteed draw; everything else off
    cfg = _zeroed(p_elastic=1.0, elastic_alpha=(300.0, 300.0))
    img, seg = _blob(h=48, w=48)
    out_img, out_seg = augment_sample_2d(jax.random.PRNGKey(7), img, seg, cfg)
    out_img, out_seg = np.asarray(out_img), np.asarray(out_seg)
    # it actually deformed something
    assert np.abs(out_img - np.asarray(img)).max() > 0.1
    # nearest-sampled seg is a label map
    assert set(np.unique(out_seg)) <= {0, 2}
    # image (bilinear) and seg (nearest) follow the SAME warp: deep inside
    # the deformed blob the image is ~1 exactly where seg==2
    inside = out_img[..., 0] > 0.95
    if inside.sum():
        assert (out_seg[inside] == 2).mean() > 0.9
    # and mass is roughly conserved (smooth field, no fold explosion)
    assert 0.5 < out_img.sum() / np.asarray(img).sum() < 1.5


def test_elastic_off_is_identity_and_default_config_gates_it():
    from csof_tpu.data.augment import default_augment_config

    cfg = _zeroed(p_elastic=0.0)
    img, seg = _blob()
    out_img, out_seg = augment_sample_2d(jax.random.PRNGKey(1), img, seg, cfg)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_seg), np.asarray(seg))
    # base pipeline has elastic at p=0.2 (ref: default_data_augmentation.py:43-46);
    # V2 envelope (AugmentConfig defaults) keeps it off (ref: nnUNetTrainerV2.py:373)
    assert default_augment_config().p_elastic == 0.2
    assert AugmentConfig().p_elastic == 0.0


def test_elastic_is_jittable():
    cfg = _zeroed(p_elastic=1.0)
    img, seg = _blob()
    f = jax.jit(lambda k, im, sg: augment_sample_2d(k, im, sg, cfg))
    out_img, out_seg = f(jax.random.PRNGKey(0), img, seg)
    assert out_img.shape == img.shape and out_seg.shape == seg.shape
