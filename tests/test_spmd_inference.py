"""Sharded-batch SPMD inference on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.parallel.mesh import make_mesh
from csof_tpu.parallel.spmd_inference import make_sharded_batch_forward, sharded_tile_predict


def test_sharded_forward_matches_single_device():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    def apply_fn(params, x):
        return x * params["scale"] + params["bias"]

    params = {"scale": jnp.float32(2.0), "bias": jnp.float32(1.0)}
    run = make_sharded_batch_forward(apply_fn, mesh)
    # batch NOT divisible by 8 -> exercises padding path
    x = jnp.asarray(np.random.RandomState(0).rand(13, 4, 4).astype(np.float32))
    out = run(params, x)
    assert out.shape == (13, 4, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1, atol=1e-6)


def test_sharded_tile_predict_with_real_net():
    from csof_tpu.models.unet import GenericUNet

    mesh = make_mesh()
    net = GenericUNet(num_classes=2, base_num_features=4,
                      pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                      deep_supervision=False)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    tiles = np.random.RandomState(0).rand(16, 16, 16, 1).astype(np.float32)
    probs = sharded_tile_predict(lambda p, x: net.apply(p, x), params, tiles, mesh)
    assert probs.shape == (16, 16, 16, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_predictor_sharded_matches_single_device():
    from csof_tpu.inference.predictor import PredictorConfig, SlidingWindowPredictor
    from csof_tpu.models.unet import GenericUNet

    mesh = make_mesh()
    net = GenericUNet(num_classes=2, base_num_features=4,
                      pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                      deep_supervision=False)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    cfg = PredictorConfig(patch_size=(16, 16), num_classes=2, do_mirroring=True, tile_batch=4)
    pred = SlidingWindowPredictor(lambda p, x: net.apply(p, x), cfg)
    img = np.random.RandomState(0).rand(1, 40, 52).astype(np.float32)
    seg_a, probs_a = pred.predict(params, img)
    seg_b, probs_b = pred.predict_sharded(params, img, mesh)
    np.testing.assert_allclose(probs_a, probs_b, atol=2e-4)
    assert (seg_a == seg_b).mean() > 0.999
