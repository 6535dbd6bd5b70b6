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


def test_fused_flag_keeps_param_tree_and_checkpoint_compat(monkeypatch):
    """CSOF_FUSED_NORM must not change the param tree: a checkpoint trained
    with the flag off restores + applies with it on (and vice versa), and the
    fused path consumes the trained InstanceNorm scale/bias."""
    from csof_tpu.models.blocks import ConvNormAct

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    block = ConvNormAct(features=8, kernel_size=(3, 3))

    monkeypatch.setenv("CSOF_FUSED_NORM", "0")
    params = block.init(jax.random.PRNGKey(0), x)
    # non-trivial affine so the fused path visibly uses the trained params
    params = jax.tree.map(lambda p: p + 0.3, params)
    ref = block.apply(params, x)

    monkeypatch.setenv("CSOF_FUSED_NORM", "1")
    fused_init = block.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(fused_init) == jax.tree.structure(params)
    fused = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)
