"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.ops.correlation import local_correlation_volume
from csof_tpu.ops.losses import ncc_loss
from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas
from csof_tpu.ops.pallas.ncc import ncc_loss_pallas, ncc_map_pallas


def test_pallas_corr_matches_reference():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(16, 16, 8).astype(np.float32))
    m = jnp.asarray(rng.rand(16, 16, 8).astype(np.float32))
    for radius, stride in [(2, 1), (1, 2), (3, 1)]:
        ref = local_correlation_volume(q, m, radius=radius, stride=stride)
        out = local_correlation_volume_pallas(q, m, radius=radius, stride=stride, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_corr_batched_tiled_matches_reference():
    """Grid-tiled batched kernel (DMA'd haloed row slabs) vs jnp reference,
    with a tile smaller than H to exercise the halo path, and vmap dispatch
    through the custom_vmap rule."""
    import jax

    from csof_tpu.ops.pallas import corr as pc

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.rand(3, 32, 16, 8).astype(np.float32))
    m = jnp.asarray(rng.rand(3, 32, 16, 8).astype(np.float32))
    ref = jax.vmap(lambda a, b: local_correlation_volume(a, b, radius=2, stride=1))(q, m)
    # force small tiles so H=32 splits into slabs
    orig = pc._pick_tile_h
    pc._pick_tile_h = lambda *a, **k: 8
    try:
        out = pc.local_correlation_volume_pallas_batched(q, m, 2, 1, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # vmap over the single-sample entry dispatches to the batched kernel
        out_v = jax.vmap(
            lambda a, b: pc.local_correlation_volume_pallas(a, b, 2, 1, True)
        )(q, m)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref), atol=1e-5)
    finally:
        pc._pick_tile_h = orig


def test_pallas_corr_non_dividing_tile_pads_rows():
    """A tile_h that does not divide H must pad + slice, not silently leave
    trailing rows unwritten (round-2 advisor finding): H=20 with a forced
    tile of 8 previously truncated the grid to 2 slabs and left rows 16-19
    as garbage."""
    import jax

    from csof_tpu.ops.pallas import corr as pc

    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.rand(2, 20, 16, 8).astype(np.float32))
    m = jnp.asarray(rng.rand(2, 20, 16, 8).astype(np.float32))
    ref = jax.vmap(lambda a, b: local_correlation_volume(a, b, radius=2, stride=1))(q, m)
    orig = pc._pick_tile_h
    pc._pick_tile_h = lambda *a, **k: 8  # 20 % 8 != 0 -> exercises row padding
    try:
        out = pc.local_correlation_volume_pallas_batched(q, m, 2, 1, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    finally:
        pc._pick_tile_h = orig
    # the tile picker itself no longer requires divisibility: a tiny budget
    # must still return a usable (small) tile, never one larger than H
    assert pc._pick_tile_h(20, 16, 8, 25, 2, 4, budget_mb=1e-9) <= 20


def test_pallas_ncc_matches_reference():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, 24, 24, 1).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 24, 24, 1).astype(np.float32))
    ref = ncc_loss(a, b, window=9)
    out = ncc_loss_pallas(a, b, window=9, interpret=True)
    assert float(out) == pytest.approx(float(ref), abs=1e-4)
    # identical images -> loss ~ 0
    same = ncc_loss_pallas(a, a, window=9, interpret=True)
    assert float(same) == pytest.approx(0.0, abs=1e-3)


def test_pallas_ncc_map_values():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    cc = ncc_map_pallas(x, x, window=5, interpret=True)
    interior = np.asarray(cc)[4:-4, 4:-4]
    np.testing.assert_allclose(interior, 1.0, atol=1e-3)


def test_pallas_corr_custom_vjp_matches_jnp_grads():
    """Gradients through the pallas corr (custom VJP: pallas fwd + shifted
    -slice XLA bwd) must equal autodiff through the jnp reference, for both
    query and memory, including under vmap."""
    import jax

    from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas

    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.rand(2, 16, 16, 6).astype(np.float32))
    m = jnp.asarray(rng.rand(2, 16, 16, 6).astype(np.float32))
    tgt = jnp.asarray(rng.rand(2, 16, 16, 25).astype(np.float32))

    def loss_pallas(q, m):
        out = jax.vmap(
            lambda a, b: local_correlation_volume_pallas(a, b, 2, 1, True)
        )(q, m)
        return jnp.sum((out - tgt) ** 2)

    def loss_jnp(q, m):
        out = jax.vmap(
            lambda a, b: local_correlation_volume(a, b, radius=2, stride=1)
        )(q, m)
        return jnp.sum((out - tgt) ** 2)

    gq_p, gm_p = jax.grad(loss_pallas, argnums=(0, 1))(q, m)
    gq_j, gm_j = jax.grad(loss_jnp, argnums=(0, 1))(q, m)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_j), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_j), atol=1e-4)


def test_pallas_corr_bf16_dtype_preserving():
    """bf16 inputs flow through the kernel as bf16 (half the byte traffic of
    the old always-f32 version) with f32 accumulation: the output dtype is
    bf16 and values match the f32 reference within bf16 rounding."""
    from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas_batched

    rng = np.random.RandomState(11)
    qf = rng.rand(2, 24, 16, 8).astype(np.float32)
    mf = rng.rand(2, 24, 16, 8).astype(np.float32)
    q16, m16 = jnp.asarray(qf, jnp.bfloat16), jnp.asarray(mf, jnp.bfloat16)
    out = local_correlation_volume_pallas_batched(q16, m16, 2, 1, interpret=True)
    assert out.dtype == jnp.bfloat16
    import jax

    ref = jax.vmap(
        lambda a, b: local_correlation_volume(a, b, radius=2, stride=1)
    )(jnp.asarray(qf), jnp.asarray(mf))
    # inputs rounded to bf16 + bf16 products: ~1% relative tolerance
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.03, atol=0.03
    )


def test_pallas_corr_bwd_kernel_matches_xla_reference():
    """The roll+fma Pallas backward (no scatters) must equal the XLA
    shifted-slice/scatter-add reference backward for dq AND dm, including
    strided windows and non-dividing tiles."""
    import os

    import jax

    from csof_tpu.ops.pallas import corr as pc

    rng = np.random.RandomState(13)
    for h, w, c, r, s in ((16, 16, 6, 2, 1), (20, 16, 4, 2, 2)):
        q = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
        m = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
        k2 = (2 * r + 1) ** 2
        tgt = jnp.asarray(rng.rand(2, h, w, k2).astype(np.float32))

        def loss(q, m, impl):
            os.environ["CSOF_CORR_BWD"] = impl
            try:
                out = jax.vmap(
                    lambda a, b: pc.local_correlation_volume_pallas(a, b, r, s, True)
                )(q, m)
                return jnp.sum((out - tgt) ** 2)
            finally:
                os.environ.pop("CSOF_CORR_BWD", None)

        gq_p, gm_p = jax.grad(lambda a, b: loss(a, b, "pallas"), (0, 1))(q, m)
        gq_j, gm_j = jax.grad(lambda a, b: loss(a, b, "jnp"), (0, 1))(q, m)
        np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_j), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_j), atol=1e-4)


def test_pallas_corr_q_cm_matches_reference():
    """Channel-major query path (the per-step transpose hoisted by SegFlow):
    forward AND custom-VJP gradients must match the channels-last path, with
    dq returned in the channel-major layout of the primal input."""
    import numpy as np

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.rand(10, 12, 5).astype(np.float32))
    m = jnp.asarray(rng.rand(10, 12, 5).astype(np.float32))
    ref = local_correlation_volume(q, m, radius=2, stride=1, impl="jnp")
    out = local_correlation_volume_pallas(
        jnp.moveaxis(q, -1, 0), m, radius=2, stride=1, interpret=True, q_cm=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients flow through the vmap rule (the only differentiable entry —
    # training always batches; the unbatched custom_vmap wrapper is
    # forward-only, a pre-existing jax limitation)
    def loss_last(q, m):
        out = jax.vmap(lambda a, b: local_correlation_volume_pallas(a, b, 2, 1, True))(q[None], m[None])
        return (out ** 2).sum()

    def loss_cm(qc, m):
        out = jax.vmap(
            lambda a, b: local_correlation_volume_pallas(a, b, 2, 1, True, q_cm=True)
        )(qc[None], m[None])
        return (out ** 2).sum()

    dq_ref, dm_ref = jax.grad(loss_last, argnums=(0, 1))(q, m)
    dq_cm, dm_cm = jax.grad(loss_cm, argnums=(0, 1))(jnp.moveaxis(q, -1, 0), m)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(dq_cm, 0, -1)), np.asarray(dq_ref), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(dm_cm), np.asarray(dm_ref), atol=1e-4)


def test_pallas_corr_q_cm_batched_vmap():
    import numpy as np

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.rand(3, 8, 8, 4).astype(np.float32))
    m = jnp.asarray(rng.rand(3, 8, 8, 4).astype(np.float32))
    ref = jax.vmap(lambda a, b: local_correlation_volume(a, b, 2, 1, impl="jnp"))(q, m)
    q_cm = jnp.moveaxis(q, -1, 1)
    out = jax.vmap(
        lambda a, b: local_correlation_volume_pallas(a, b, 2, 1, True, q_cm=True)
    )(q_cm, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("radius,stride,c", [(2, 1, 5), (1, 2, 3), (4, 2, 8)])
def test_pallas_corr_bwd_v2_matches_xla(radius, stride, c, monkeypatch):
    """The dx-gridded split backward kernels (v2) vs the XLA shifted-slice
    backward, through the real custom-VJP dispatch."""
    from csof_tpu.ops.pallas import corr as pc

    rng = np.random.RandomState(7)
    h = w = 4 * radius + 6
    q = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
    m = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
    g = jnp.asarray(rng.rand(2, h, w, (2 * radius + 1) ** 2).astype(np.float32))
    dq2, dm2 = pc._corr_bwd_pallas_v2(q, m, g, radius, stride, interpret=True)

    # XLA reference via the dispatch (CSOF_CORR_BWD=jnp)
    monkeypatch.setenv("CSOF_CORR_BWD", "jnp")
    fn = pc._make_corr_fn(radius, stride, True)

    def loss(q, m):
        out = jax.vmap(lambda a, b: fn(a, b))(q, m)
        return jnp.sum(out * g)

    dq_ref, dm_ref = jax.grad(loss, argnums=(0, 1))(q, m)
    np.testing.assert_allclose(np.asarray(dq2), np.asarray(dq_ref), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dm2), np.asarray(dm_ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "n,h,w,ci,co",
    [
        (2, 10, 16, 32, 32),   # non-dividing row tile (hpad path)
        (1, 8, 16, 8, 16),     # ci != co, small channels
        (2, 16, 4, 32, 64),    # W*C aligned via small W
    ],
)
def test_pallas_conv3x3_cols_matches_xla(n, h, w, ci, co):
    """Tap-widened cols conv (H-im2col matmul + in-VMEM column taps) vs
    lax.conv_general_dilated, fwd, stride-1 SAME."""
    from csof_tpu.ops.pallas.conv import conv3x3_cols

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, wt, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = conv3x3_cols(x, wt, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5)
    out32 = conv3x3_cols(x, wt, True, True)
    assert out32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_pallas_conv3x3_cols_grads_match_xla():
    """custom-VJP: dx via the flipped-weight kernel, dw via XLA — both must
    match the native conv's grads."""
    from csof_tpu.ops.pallas.conv import conv3x3_cols

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))

    def loss_pl(x, w):
        return jnp.sum(conv3x3_cols(x, w, True) * g)

    def loss_ref(x, w):
        return jnp.sum(
            jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            * g
        )

    dx, dw = jax.grad(loss_pl, argnums=(0, 1))(x, wt)
    dx_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), atol=1e-3, rtol=1e-5)


def test_pallas_conv3x3_cols_vmap_folds_into_batch():
    """conv3x3_cols_vb under jax.vmap folds the mapped axis into the
    kernel's N grid axis (no pallas auto-batching); values and grads match
    the per-sample calls."""
    from csof_tpu.ops.pallas.conv import conv3x3_cols, conv3x3_cols_vb

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 2, 8, 16, 8).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    out = jax.vmap(lambda v: conv3x3_cols_vb(v, wt, True))(x)
    ref = jnp.stack([conv3x3_cols(x[i], wt, True) for i in range(3)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss(w):
        return jnp.sum(jax.vmap(lambda v: conv3x3_cols_vb(v, w, True))(x) ** 2)

    def loss_ref(w):
        return sum(jnp.sum(conv3x3_cols(x[i], w, True) ** 2) for i in range(3))

    dw = jax.grad(loss)(wt)
    dw_r = jax.grad(loss_ref)(wt)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), atol=1e-3, rtol=1e-5)
