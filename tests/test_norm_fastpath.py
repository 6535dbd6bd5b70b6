"""bf16 norm fast paths vs the f32 reference formula.

The bf16 branches of InstanceNorm/GroupNorm use a single variadic
lax.reduce for (sum, sum_sq) and flat (N, C)/(N, g, c/g) affine coeffs
(round-4 serving finding: per-kernel floor ~50-90 us on the axon backend
made the old keepdims+tile stat pipeline the dominant kernel count of the
SegFlow scan step). These tests pin that the fast path matches the f32
formula to bf16 tolerance and stays differentiable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.models.blocks import GroupNorm, InstanceNorm


def _ref_instance_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(np.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    return (xf - mean) / np.sqrt(var + eps) * scale + bias


def _ref_group_norm(x, scale, bias, g, eps=1e-5):
    n, *spatial, c = x.shape
    xf = x.astype(np.float32).reshape(n, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = ((xf - mean) / np.sqrt(var + eps)).reshape(n, *spatial, c)
    return y * scale + bias


@pytest.mark.parametrize("shape", [(2, 9, 7, 16), (1, 5, 6, 4, 8)])
def test_instance_norm_bf16_matches_f32_formula(shape):
    rng = np.random.RandomState(0)
    x = (rng.rand(*shape) * 4 - 2).astype(np.float32)
    scale = rng.rand(shape[-1]).astype(np.float32) + 0.5
    bias = rng.rand(shape[-1]).astype(np.float32) - 0.5

    norm = InstanceNorm()
    params = norm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda _: None, params)  # rebuilt below
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}

    out = norm.apply(params, jnp.asarray(x, jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    ref = _ref_instance_norm(x.astype(jnp.bfloat16).astype(np.float32), scale, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.05, rtol=0.02)


@pytest.mark.parametrize("c,g", [(16, 8), (12, 8), (32, 8)])
def test_group_norm_bf16_matches_f32_formula(c, g):
    rng = np.random.RandomState(1)
    x = (rng.rand(2, 10, 11, c) * 4 - 2).astype(np.float32)
    scale = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.rand(c).astype(np.float32) - 0.5
    # GroupNorm shrinks g until it divides c (same rule as the module)
    geff = min(g, c)
    while c % geff:
        geff -= 1

    norm = GroupNorm(num_groups=g)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}

    out = norm.apply(params, jnp.asarray(x, jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    ref = _ref_group_norm(x.astype(jnp.bfloat16).astype(np.float32), scale, bias, geff)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.05, rtol=0.02)


def test_group_norm_bf16_matches_own_f32_path():
    rng = np.random.RandomState(2)
    x = (rng.rand(3, 8, 8, 32) * 2 - 1).astype(np.float32)
    norm = GroupNorm(num_groups=8)
    params = norm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    f32_out = norm.apply(params, jnp.asarray(x))
    bf16_out = norm.apply(params, jnp.asarray(x, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(bf16_out, np.float32), np.asarray(f32_out), atol=0.05, rtol=0.02
    )


def test_norm_fast_paths_differentiable():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 6, 6, 16), jnp.bfloat16)
    for norm in (InstanceNorm(), GroupNorm(num_groups=8)):
        params = norm.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.mean(jnp.square(norm.apply(p, x).astype(jnp.float32)))

        g = jax.grad(loss)(params, x)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)
