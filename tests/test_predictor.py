"""Sliding-window predictor: TTA equivalence, aggregation exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.inference.predictor import PredictorConfig, SlidingWindowPredictor


def constant_net(params, x):
    """'Network' that returns per-pixel logits equal to a linear function of
    the input so aggregation can be checked analytically. Flip-equivariant."""
    c0 = x[..., :1] * 2.0
    return jnp.concatenate([c0, -c0], axis=-1)


def test_identity_aggregation_exact():
    # flip-equivariant net + gaussian aggregation must reproduce per-pixel
    # prediction exactly regardless of tiling/TTA
    rng = np.random.RandomState(0)
    img = rng.rand(1, 40, 52).astype(np.float32)
    cfg = PredictorConfig(patch_size=(16, 16), num_classes=2, tile_batch=4)
    pred = SlidingWindowPredictor(constant_net, cfg)
    seg, probs = pred.predict({}, img)
    assert seg.shape == (40, 52)
    assert probs.shape == (2, 40, 52)
    expected = jax.nn.softmax(
        jnp.stack([jnp.asarray(img[0]) * 2, -jnp.asarray(img[0]) * 2]), axis=0
    )
    np.testing.assert_allclose(probs, np.asarray(expected), atol=1e-4)
    np.testing.assert_array_equal(seg, (img[0] <= 0).astype(int))


def test_image_smaller_than_patch_padded():
    img = np.random.RandomState(0).rand(1, 10, 12).astype(np.float32)
    cfg = PredictorConfig(patch_size=(16, 16), num_classes=2, do_mirroring=False)
    pred = SlidingWindowPredictor(constant_net, cfg)
    seg, probs = pred.predict({}, img)
    assert seg.shape == (10, 12)
    assert probs.shape == (2, 10, 12)


def test_mirroring_changes_nothing_for_equivariant_net():
    img = np.random.RandomState(1).rand(1, 24, 24).astype(np.float32)
    cfg_m = PredictorConfig(patch_size=(16, 16), num_classes=2, do_mirroring=True)
    cfg_n = PredictorConfig(patch_size=(16, 16), num_classes=2, do_mirroring=False)
    pm = SlidingWindowPredictor(constant_net, cfg_m)
    pn = SlidingWindowPredictor(constant_net, cfg_n)
    _, probs_m = pm.predict({}, img)
    _, probs_n = pn.predict({}, img)
    np.testing.assert_allclose(probs_m, probs_n, atol=1e-5)


def test_trained_unet_through_predictor():
    """Real flax U-Net through the tiled predictor on a 3D stack of slices."""
    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(
        num_classes=2,
        base_num_features=4,
        pool_kernel_sizes=((2, 2),),
        conv_kernel_sizes=((3, 3), (3, 3)),
        deep_supervision=False,
    )
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    cfg = PredictorConfig(patch_size=(16, 16), num_classes=2, tile_batch=4)
    pred = SlidingWindowPredictor(lambda p, x: net.apply(p, x), cfg)
    vol = np.random.RandomState(0).rand(1, 3, 20, 20).astype(np.float32)
    seg, probs = pred.predict_2d_stack(params, vol)
    assert seg.shape == (3, 20, 20)
    assert probs.shape == (2, 3, 20, 20)
    np.testing.assert_allclose(probs.sum(0), 1.0, atol=1e-4)


def test_2d_stack_matches_per_slice_loop():
    """The depth-folded single-program path must equal slice-by-slice
    predict() (and exercise depth bucketing: D=5 pads to 8)."""
    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(
        num_classes=3, base_num_features=4,
        pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
        deep_supervision=False,
    )
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    cfg = PredictorConfig(patch_size=(16, 16), num_classes=3, tile_batch=3)
    pred = SlidingWindowPredictor(lambda p, x: net.apply(p, x), cfg)
    vol = np.random.RandomState(2).rand(1, 5, 22, 26).astype(np.float32)
    seg, probs = pred.predict_2d_stack(params, vol)
    assert seg.shape == (5, 22, 26)
    assert probs.shape == (3, 5, 22, 26)
    for d in range(5):
        s_d, p_d = pred.predict(params, vol[:, d])
        np.testing.assert_allclose(probs[:, d], p_d, atol=1e-5)
        np.testing.assert_array_equal(seg[d], s_d)


def test_predictor_3d_patches():
    """3D tiled prediction through the same engine (config-2 capability)."""
    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(
        num_classes=2, base_num_features=4,
        pool_kernel_sizes=((2, 2, 2),), conv_kernel_sizes=((3, 3, 3), (3, 3, 3)),
        deep_supervision=False,
    )
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    cfg = PredictorConfig(patch_size=(8, 16, 16), num_classes=2, tile_batch=2,
                          do_mirroring=True)
    pred = SlidingWindowPredictor(lambda p, x: net.apply(p, x), cfg)
    vol = np.random.RandomState(0).rand(1, 10, 20, 20).astype(np.float32)
    seg, probs = pred.predict(params, vol)
    assert seg.shape == (10, 20, 20)
    assert probs.shape == (2, 10, 20, 20)
    np.testing.assert_allclose(probs.sum(0), 1.0, atol=1e-4)
