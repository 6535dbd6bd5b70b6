"""FinalFlow (pluggable bottleneck) + spatio-temporal transformer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.models.finalflow import FinalFlow, FinalFlowConfig
from csof_tpu.models.spacetime import SpatioTemporalTransformer


def test_spatiotemporal_transformer_shapes():
    m = SpatioTemporalTransformer(dim=16, depth=1, num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 8, 8, 8).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (3, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("bottleneck", ["gru", "3d", "transformer"])
def test_finalflow_bottleneck_variants(bottleneck):
    cfg = FinalFlowConfig(
        out_encoder_dims=(8, 16), bottleneck_type=bottleneck, bottleneck_heads=2,
        dtype="float32",
    )
    model = FinalFlow(cfg)
    video = jnp.asarray(np.random.RandomState(0).rand(3, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    assert out["flow"].shape == (3, 16, 16, 2)
    assert out["registered"].shape == (3, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(out["flow"][0]), 0.0, atol=0)
    assert np.isfinite(np.asarray(out["flow"])).all()


def test_finalflow_diffeomorphic():
    cfg = FinalFlowConfig(out_encoder_dims=(8, 16), diffeomorphic=True, int_steps=4,
                          dtype="float32")
    model = FinalFlow(cfg)
    video = jnp.zeros((2, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    assert out["velocity"] is not None
    assert out["flow_forward"].shape == (2, 16, 16, 2)
