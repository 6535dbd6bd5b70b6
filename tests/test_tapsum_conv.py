"""Tap-sum conv (ops/tapsum_conv.py): exactness vs the native lowering and
drop-in param compatibility inside ConvNormAct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.models.blocks import ConvNormAct
from csof_tpu.ops.tapsum_conv import conv2d_tapsum, tapsum_worthwhile


@pytest.mark.parametrize(
    "kh,kw,ci,co,h,w", [(3, 3, 64, 32, 16, 20), (3, 3, 5, 7, 9, 11), (5, 3, 4, 6, 12, 10)]
)
@pytest.mark.parametrize("mode", ["cols", "taps"])
def test_matches_native_conv(kh, kw, ci, co, h, w, mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(co).astype(np.float32))
    pad = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    ref = (
        jax.lax.conv_general_dilated(
            x, wt, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )
    got = conv2d_tapsum(x, wt, b, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_gradients_match_native():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 4, 3).astype(np.float32))

    def f_tap(w, x):
        return jnp.sum(conv2d_tapsum(x, w, mode="cols") ** 2) + jnp.sum(
            conv2d_tapsum(x, w, mode="taps") ** 2
        )

    def f_nat(w, x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return 2 * jnp.sum(y**2)

    for argnum in (0, 1):
        g1 = jax.grad(f_tap, argnum)(wt, x)
        g2 = jax.grad(f_nat, argnum)(wt, x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


def test_bf16_grads_work_and_match_f32():
    """Low-precision regression: conv2d_f32acc keeps the wide-accum forward
    but must stay DIFFERENTIABLE on bf16 inputs (the raw
    preferred_element_type=f32 conv has no valid transpose rule there —
    this crashed grad through every bf16 (3,3,3) Conv3dVia2D)."""
    from csof_tpu.ops.tapsum_conv import conv2d_f32acc

    rng = np.random.RandomState(5)
    x32 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w32 = jnp.asarray(rng.randn(3, 3, 4, 3).astype(np.float32) * 0.1)

    def loss(x, w, mode):
        return conv2d_tapsum(x, w, mode=mode).astype(jnp.float32).sum()

    for mode in ("cols", "taps"):
        gx, gw = jax.grad(
            lambda x, w: loss(x, w, mode), argnums=(0, 1)
        )(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
        gx32, gw32 = jax.grad(
            lambda x, w: loss(x, w, mode), argnums=(0, 1)
        )(x32, w32)
        np.testing.assert_allclose(
            np.asarray(gx, np.float32), np.asarray(gx32), atol=0.15, rtol=0.1
        )
        np.testing.assert_allclose(
            np.asarray(gw, np.float32), np.asarray(gw32), atol=0.5, rtol=0.1
        )

    # the helper directly: same story, plus forward == wide-accum conv
    y = conv2d_f32acc(
        x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)),
    )
    assert y.dtype == jnp.float32
    g = jax.grad(
        lambda x: conv2d_f32acc(x, w32.astype(jnp.bfloat16), (1, 1),
                                ((1, 1), (1, 1))).sum()
    )(x32.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16


def test_conv3dvia2d_bf16_grad():
    """grad through a bf16 (3,3,3) Conv3dVia2D — the exact geometry the
    save_conv remat test trains (f32 cross-dz accumulation, kz>1)."""
    from csof_tpu.models.blocks import Conv3dVia2D

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 4, 8, 8, 4).astype(np.float32))
    mod = Conv3dVia2D(6, kernel_size=(3, 3, 3), dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    g = jax.grad(
        lambda p: mod.apply(p, x).astype(jnp.float32).sum()
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)


def test_worthwhile_heuristic():
    assert tapsum_worthwhile(3, 3, 64, 32)
    assert not tapsum_worthwhile(3, 3, 128, 128)  # already lane-full
    assert not tapsum_worthwhile(3, 3, 64, 32, strides=(2, 2))
    assert not tapsum_worthwhile(1, 1, 64, 32)  # no taps to widen with


def test_convnormact_env_switch_same_params_same_output(monkeypatch):
    """The tapsum branch must consume the SAME Conv_0 kernel/bias params and
    give the same output as the native branch (checkpoint compatibility)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 16, 16, 24).astype(np.float32))
    mod = ConvNormAct(32, (3, 3), norm="group")

    monkeypatch.delenv("CSOF_CONV2D_IMPL", raising=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)

    monkeypatch.setenv("CSOF_CONV2D_IMPL", "tapsum")
    p2 = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_segflow_forward_same_under_tapsum(monkeypatch):
    """Whole-model check: flagship forward is numerically unchanged."""
    from csof_tpu.config.experiment import SegFlowModelConfig
    from csof_tpu.models.segflow import SegFlow

    cfg = SegFlowModelConfig(
        out_encoder_dims=(8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(1, 1), corr_stride=(1, 1),
        dtype="float32", deep_supervision=False,
    )
    video = jnp.asarray(np.random.RandomState(3).rand(3, 16, 16, 1).astype(np.float32))
    model = SegFlow(cfg=cfg, num_classes=3)
    monkeypatch.delenv("CSOF_CONV2D_IMPL", raising=False)
    params = model.init(jax.random.PRNGKey(0), video)
    ref = model.apply(params, video)
    monkeypatch.setenv("CSOF_CONV2D_IMPL", "tapsum")
    p2 = model.init(jax.random.PRNGKey(0), video)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    got = model.apply(params, video)
    for k in ("seg_logits", "flow", "cum_flow"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=5e-5, rtol=1e-4, err_msg=k
        )


def test_conv3dvia2d_tapsum_matches_native(monkeypatch):
    """3D conv (via-2D) under tapsum == native inner convs, same params."""
    from csof_tpu.models.blocks import Conv3dVia2D

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 5, 12, 12, 8).astype(np.float32))
    mod = Conv3dVia2D(16, kernel_size=(3, 3, 3))
    monkeypatch.delenv("CSOF_CONV2D_IMPL", raising=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("CSOF_CONV2D_IMPL", "tapsum")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
