import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.models.deformable import DeformableAttention2D, DeformableTransformerLayer


def test_deformable_attention_shapes():
    m = DeformableAttention2D(dim=16, num_heads=2, num_points=3)
    q = jnp.asarray(np.random.RandomState(0).rand(8, 8, 16).astype(np.float32))
    v = jnp.asarray(np.random.RandomState(1).rand(16, 16, 16).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), q, v)
    out = m.apply(params, q, v)
    assert out.shape == (8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_deformable_layer_residual():
    m = DeformableTransformerLayer(dim=16, num_heads=2, num_points=2, dim_feedforward=32)
    q = jnp.asarray(np.random.RandomState(0).rand(8, 8, 16).astype(np.float32))
    v = jnp.zeros((8, 8, 16))
    params = m.init(jax.random.PRNGKey(0), q, v)
    out = m.apply(params, q, v)
    assert out.shape == (8, 8, 16)
