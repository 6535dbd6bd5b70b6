"""VoxelMorph + SegFlow model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import SegFlowModelConfig, VoxelMorphModelConfig
from csof_tpu.models.segflow import SegFlow
from csof_tpu.models.voxelmorph import VoxelMorph, register_sequence


def small_vxm(diffeo=True):
    return VoxelMorph(
        VoxelMorphModelConfig(
            enc_features=(4, 8, 8),
            dec_features=(8, 8, 4, 4),
            int_steps=4,
            diffeomorphic=diffeo,
            dtype="float32",
        )
    )


def test_voxelmorph_forward_shapes():
    model = small_vxm()
    m = jnp.zeros((2, 16, 16, 1))
    f = jnp.zeros((2, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), m, f)
    out = model.apply(params, m, f)
    assert out["flow"].shape == (2, 16, 16, 2)
    assert out["flow_inverse"].shape == (2, 16, 16, 2)
    assert out["registered"].shape == (2, 16, 16, 1)
    # near-zero init head -> near-identity registration
    rng = np.random.RandomState(0)
    mv = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    out2 = model.apply(params, mv, f)
    np.testing.assert_allclose(np.asarray(out2["registered"]), np.asarray(mv), atol=1e-3)


def test_voxelmorph_sequence_registration():
    model = small_vxm(diffeo=False)
    frames = jnp.asarray(np.random.RandomState(1).rand(5, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), frames[1:], frames[1:])
    out = register_sequence(model, params, frames)
    assert out["flow"].shape == (4, 16, 16, 2)


def segflow_tiny():
    cfg = SegFlowModelConfig(
        out_encoder_dims=(8, 16),
        d_model=16,
        bottleneck_heads=2,
        dim_feedforward=32,
        corr_radius=(2, 2),
        corr_stride=(1, 1),
        dtype="float32",
    )
    return SegFlow(cfg=cfg, num_classes=4)


def test_segflow_forward_shapes():
    model = segflow_tiny()
    video = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    # flows are CHANNEL-MAJOR (T, 2, H, W) and registered has no channel
    # axis — the TPU lane-padding-free layout (models/segflow.py convention)
    assert out["flow"].shape == (4, 2, 16, 16)
    assert out["cum_flow"].shape == (4, 2, 16, 16)
    assert out["seg_logits"].shape == (4, 16, 16, 4)
    assert out["registered"].shape == (4, 16, 16)
    # frame 0 flow must be exactly zero (identity anchor)
    np.testing.assert_allclose(np.asarray(out["flow"][0]), 0.0, atol=0)
    assert np.isfinite(np.asarray(out["seg_logits"])).all()


def test_segflow_param_sharing_across_time():
    """Params must not scale with T (one scanned step)."""
    model = segflow_tiny()
    v4 = jnp.zeros((4, 16, 16, 1))
    v6 = jnp.zeros((6, 16, 16, 1))
    p4 = model.init(jax.random.PRNGKey(0), v4)
    n_params = sum(x.size for x in jax.tree.leaves(p4))
    out6 = model.apply(p4, v6)  # same params work for any T
    assert out6["flow"].shape[0] == 6
    assert n_params < 500_000


def test_segflow_remat_gradients():
    """remat variant produces identical loss and finite grads."""
    from csof_tpu.config.experiment import SegFlowModelConfig

    cfg = SegFlowModelConfig(
        out_encoder_dims=(4, 8), d_model=8, bottleneck_heads=2, dim_feedforward=16,
        corr_radius=(1, 1), corr_stride=(1, 1), dtype="float32", remat=True,
    )
    model = SegFlow(cfg=cfg, num_classes=4)
    video = jnp.asarray(np.random.RandomState(0).rand(3, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)

    def loss(p):
        out = model.apply(p, video)
        return jnp.mean(out["registered"] ** 2) + jnp.mean(out["seg_logits"] ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
