"""Conv3dVia2D: 3D conv recast as z-shifted batched 2D convs.

TPU-side motivation: XLA's native 3D conv lowering on this backend reaches
only 4-9 TF/s at Task002 3d_fullres geometry while the mathematically exact
z-shifted 2D recast reaches 27-29 TF/s (tools/bench_conv3d.py, fetch-sync
timing).  These tests pin the exactness claim: identical params, identical
outputs, for every (kernel, stride) combination the Task002 plans generate
(ref: nnunet/experiment_planning/experiment_planner_baseline_3DUNet.py
pool/kernel schedule).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from csof_tpu.models.blocks import Conv3dVia2D


CASES = [
    # (kernel, stride) combos from Task002 3d_fullres plans
    ((1, 3, 3), (1, 1, 1)),
    ((1, 3, 3), (1, 2, 2)),
    ((3, 3, 3), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2)),
    ((3, 3, 3), (1, 2, 2)),
]


def _same_pad(kernel):
    return [((k - 1) // 2, k // 2) for k in kernel]


@pytest.mark.parametrize("kernel,stride", CASES)
def test_conv3d_via2d_matches_nn_conv(kernel, stride):
    rng = np.random.RandomState(hash((kernel, stride)) % 2**31)
    x = jnp.asarray(rng.randn(2, 8, 12, 10, 5).astype(np.float32))
    ref = nn.Conv(7, kernel_size=kernel, strides=stride, padding=_same_pad(kernel))
    fast = Conv3dVia2D(7, kernel_size=kernel, strides=stride, padding=_same_pad(kernel))
    p = ref.init(jax.random.PRNGKey(0), x)
    # identical param names/shapes => p transfers verbatim
    p2 = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    assert [l.shape for l in jax.tree_util.tree_leaves(p)] == [
        l.shape for l in jax.tree_util.tree_leaves(p2)
    ]
    y_ref = ref.apply(p, x)
    y_fast = fast.apply(p, x)
    assert y_ref.shape == y_fast.shape
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fast), atol=2e-5, rtol=1e-5)


def test_conv3d_via2d_grad_matches():
    kernel, stride = (3, 3, 3), (1, 2, 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 8, 8, 4).astype(np.float32))
    ref = nn.Conv(6, kernel_size=kernel, strides=stride, padding=_same_pad(kernel))
    fast = Conv3dVia2D(6, kernel_size=kernel, strides=stride, padding=_same_pad(kernel))
    p = ref.init(jax.random.PRNGKey(1), x)
    g_ref = jax.grad(lambda p: (ref.apply(p, x) ** 2).sum())(p)
    g_fast = jax.grad(lambda p: (fast.apply(p, x) ** 2).sum())(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)


def test_generic_unet_checkpoint_transfers_across_impls(monkeypatch):
    """CSOF_CONV3D_IMPL=2d|native must produce the SAME param tree and the
    same forward output — checkpoints written under one flag load under the
    other (the via2d module is name-pinned to Conv_0)."""
    from csof_tpu.models.unet import GenericUNet

    pools = ((1, 2, 2), (2, 2, 2))
    kernels = ((1, 3, 3), (3, 3, 3), (3, 3, 3))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 16, 16, 1).astype(np.float32))

    def build():
        return GenericUNet(
            num_classes=3, base_num_features=4, pool_kernel_sizes=pools,
            conv_kernel_sizes=kernels, deep_supervision=False,
            dtype=jnp.float32,
        )

    monkeypatch.setenv("CSOF_CONV3D_IMPL", "native")
    p_native = build().init(jax.random.PRNGKey(0), x)
    y_native = build().apply(p_native, x)
    monkeypatch.setenv("CSOF_CONV3D_IMPL", "2d")
    p_2d = build().init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_native) == jax.tree_util.tree_structure(p_2d)
    y_2d = build().apply(p_native, x)  # native params through the 2d path
    np.testing.assert_allclose(
        np.asarray(y_native), np.asarray(y_2d), atol=2e-5, rtol=1e-5
    )


def test_conv3d_via2d_pallas_cols_matches_native(monkeypatch):
    """CSOF_CONV2D_IMPL=pallas routes the stride-1 3x3 inner convs through
    the Pallas cols kernel (interpret mode off-TPU) — same params, same
    outputs as the native path, for both kz=1 and kz=3."""
    rng = np.random.RandomState(11)
    # W * C must be 128-aligned for the kernel: W=16, Ci=8 -> 128
    x = jnp.asarray(rng.randn(2, 6, 8, 16, 8).astype(np.float32))
    for kernel in ((1, 3, 3), (3, 3, 3)):
        mod = Conv3dVia2D(16, kernel_size=kernel, padding=_same_pad(kernel))
        params = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.delenv("CSOF_CONV2D_IMPL", raising=False)
        ref = mod.apply(params, x)
        monkeypatch.setenv("CSOF_CONV2D_IMPL", "pallas")
        out = mod.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )


def test_convnormact_2d_pallas_cols_matches_native(monkeypatch):
    """The 2D ConvNormAct branch under CSOF_CONV2D_IMPL=pallas (PallasConv,
    param path pinned to Conv_0) matches the nn.Conv branch bit-for-tol."""
    from csof_tpu.models.blocks import ConvNormAct

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
    mod = ConvNormAct(16, (3, 3), norm="group")
    monkeypatch.delenv("CSOF_CONV2D_IMPL", raising=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("CSOF_CONV2D_IMPL", "pallas")
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)
