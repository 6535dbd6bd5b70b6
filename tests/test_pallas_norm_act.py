import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.models.blocks import InstanceNorm, leaky_relu
from csof_tpu.ops.pallas.norm_act import instance_norm_leaky_relu_pallas


def test_fused_norm_act_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 8).astype(np.float32))
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)

    norm = InstanceNorm()
    params = {"params": {"scale": scale, "bias": bias}}
    ref = leaky_relu(norm.apply(params, x))

    out = instance_norm_leaky_relu_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
