"""On-device augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

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
        p_brightness=0, p_contrast=0, p_gamma=0,
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
