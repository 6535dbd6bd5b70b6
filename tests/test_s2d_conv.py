"""Space-to-depth packed conv (ops/s2d_conv.py) + packed UNet stages.

Exactness contract: the packed k=2 conv with the structurally-zeroed
packed weight is the SAME math as the stride-1 3x3 SAME conv (see the
derivation in ops/s2d_conv.py), and a GenericUNet built with
CSOF_UNET_S2D=1 has the IDENTICAL param tree and outputs as the default
(ref semantics being preserved: generic_UNet.py:167-449 conv stages)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.ops.s2d_conv import (
    conv2d_s2d,
    conv2d_s2d_packed,
    depth_to_space,
    pack_weight,
    space_to_depth,
)


def _native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_pack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 6, 8, 5), jnp.float32)
    assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)
    # block-major order: packed channel = (2*dy+dx)*C + c
    xp = space_to_depth(x)
    assert xp.shape == (2, 3, 4, 20)
    np.testing.assert_array_equal(np.asarray(xp[:, 1, 1, 5:10]), np.asarray(x[:, 2, 3]))


def test_pack_weight_shape_and_zeros():
    w = jnp.asarray(np.random.RandomState(1).rand(3, 3, 4, 6), jnp.float32)
    wp = pack_weight(w)
    assert wp.shape == (2, 2, 16, 24)
    # (u=1, qy=1, py=1) needs ky=3 -> structural zero for every qx/px/v:
    # q blocks {2,3} (rows 8:16), phase blocks {2,3} (cols 12:24)
    assert float(jnp.abs(wp[1, 0, 8:16, 12:24]).max()) == 0.0
    assert float(jnp.abs(wp[1, 1, 8:16, 12:24]).max()) == 0.0
    # (u=0, qy=0, py=0) needs ky=-1 -> zero: q blocks {0,1}, phases {0,1}
    assert float(jnp.abs(wp[0, 0, 0:8, 0:12]).max()) == 0.0


@pytest.mark.parametrize("ci,co,h,w", [(3, 5, 8, 10), (1, 32, 6, 8), (8, 4, 12, 6)])
def test_conv2d_s2d_forward_parity(ci, co, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv2d_s2d(x, k)), np.asarray(_native(x, k)), atol=2e-5
    )


def test_conv2d_s2d_packed_io_matches_packing():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5) * 0.2, jnp.float32)
    yp = conv2d_s2d_packed(space_to_depth(x), k)
    np.testing.assert_allclose(
        np.asarray(yp), np.asarray(space_to_depth(_native(x, k))), atol=2e-5
    )


def test_conv2d_s2d_grad_parity():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 10, 3), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5) * 0.2, jnp.float32)

    def f(fn):
        return jax.grad(lambda k_, x_: jnp.sum(jnp.sin(fn(x_, k_))), argnums=(0, 1))(k, x)

    (gk1, gx1), (gk0, gx0) = f(lambda x_, k_: conv2d_s2d(x_, k_)), f(_native)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-4)


def test_conv2d_s2d_bf16_f32acc():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.2, jnp.bfloat16)
    y = conv2d_s2d(x, k, f32_acc=True)
    assert y.dtype == jnp.float32
    ref = _native(x.astype(jnp.float32), k.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=0.1)
    # differentiable (the raw preferred_element_type path is not, on bf16)
    jax.grad(lambda k_: jnp.sum(conv2d_s2d(x, k_, f32_acc=True)))(k)


def test_packed_instance_norm_parity():
    from csof_tpu.models.blocks import InstanceNorm

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 3, 8, 6, 4), jnp.float32)  # (N, D, H, W, C)
    norm = InstanceNorm()
    variables = norm.init(jax.random.PRNGKey(0), x)
    # nontrivial affine
    variables = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.rand(*a.shape), a.dtype), variables
    )
    ref = norm.apply(variables, x)
    got = depth_to_space(
        InstanceNorm(packed_blocks=4).apply(variables, space_to_depth(x))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_unet_s2d_stage_parity(monkeypatch):
    """CSOF_UNET_S2D=1: identical param tree, same fwd outputs and grads
    as the default path (packed stages gate on C<=48 / stride-1 / even HW)."""
    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(
        num_classes=3, base_num_features=8, max_features=32,
        pool_kernel_sizes=((1, 2, 2), (2, 2, 2)),
        conv_kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3)),
        deep_supervision=True,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 16, 12, 1), jnp.float32)
    monkeypatch.delenv("CSOF_UNET_S2D", raising=False)
    params = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(params, x)

    def loss(p):
        return sum(jnp.sum(jnp.sin(o)) for o in net.apply(p, x))

    g_ref = jax.grad(loss)(params)

    monkeypatch.setenv("CSOF_UNET_S2D", "1")
    params_s2d = net.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_s2d
    )
    got = net.apply(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4)
    g_s2d = jax.grad(loss)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_s2d)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)


def test_unet_s2d_odd_spatial_falls_back(monkeypatch):
    """Odd H or W must silently take the unpacked path (no crash)."""
    from csof_tpu.models.unet import GenericUNet

    monkeypatch.setenv("CSOF_UNET_S2D", "1")
    net = GenericUNet(
        num_classes=2, base_num_features=8, max_features=16,
        pool_kernel_sizes=((1, 2, 2),),
        conv_kernel_sizes=((1, 3, 3), (3, 3, 3)),
        deep_supervision=False,
    )
    x = jnp.asarray(np.random.RandomState(1).rand(1, 2, 14, 10, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(params, x).shape == (1, 2, 14, 10, 2)
