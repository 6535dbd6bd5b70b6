"""SkipFuse corr-fuse modes (round-3 perf work, VERDICT item 2).

The reference fuses (query ⊕ memory ⊕ correlation) skips with one 3x3 conv
over the raw channel concat (ref: nnunet/lib/models/SegFlowGaussian.py:1374-1386).
On TPU the odd concat widths (C_q + C_m + 81) lane-pad to the next multiple
of 128, inflating the fuse conv; `split` computes the IDENTICAL math as
conv_q(q) + conv_m(m) + conv_corr(corr) without materializing the concat
(a conv is linear in its input channels), and `project` low-rank-factorizes
the corr contribution through a 1x1 conv first.
"""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.models.segflow import SegFlow, SkipFuse


def _inputs(cq=12, cm=12, cc=9, h=16, w=16):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, h, w, cq).astype(np.float32))
    m = jnp.asarray(rng.randn(1, h, w, cm).astype(np.float32))
    corr = jnp.asarray(rng.randn(1, h, w, cc).astype(np.float32))
    return q, m, corr


def test_split_mode_exactly_matches_concat():
    """conv(q⊕m⊕corr) == conv_q(q)+conv_m(m)+conv_corr(corr) when the split
    kernels are the channel-slices of the concat kernel (linearity)."""
    q, m, corr = _inputs()
    cq, cm = q.shape[-1], m.shape[-1]

    fuse_cat = SkipFuse(8, mode="concat")
    fuse_spl = SkipFuse(8, mode="split")
    p_cat = fuse_cat.init(jax.random.PRNGKey(0), q, m, corr)
    p_spl = fuse_spl.init(jax.random.PRNGKey(1), q, m, corr)

    # stitch: the concat conv kernel is (3, 3, cq+cm+cc, F); its channel
    # slices are exactly the split kernels
    k = p_cat["params"]["ConvNormAct_0"]["Conv_0"]["kernel"]
    b = p_cat["params"]["ConvNormAct_0"]["Conv_0"]["bias"]
    norm = p_cat["params"]["ConvNormAct_0"]["GroupNorm_0"]
    p_spl = jax.tree_util.tree_map(lambda x: x, p_spl)  # copy
    p_spl["params"]["conv_q"]["kernel"] = k[:, :, :cq]
    p_spl["params"]["conv_q"]["bias"] = b
    p_spl["params"]["conv_m"]["kernel"] = k[:, :, cq : cq + cm]
    p_spl["params"]["conv_corr"]["kernel"] = k[:, :, cq + cm :]
    p_spl["params"]["GroupNorm_0"] = norm

    out_cat = fuse_cat.apply(p_cat, q, m, corr)
    out_spl = fuse_spl.apply(p_spl, q, m, corr)
    np.testing.assert_allclose(np.asarray(out_cat), np.asarray(out_spl), atol=2e-5)


def test_project_and_mean1_shapes_and_grads():
    q, m, corr = _inputs()
    for mode in ("project", "mean1"):
        fuse = SkipFuse(8, mode=mode)
        params = fuse.init(jax.random.PRNGKey(0), q, m, corr)
        out = fuse.apply(params, q, m, corr)
        assert out.shape == (1, 16, 16, 8)
        assert np.isfinite(np.asarray(out)).all()
        g = jax.grad(lambda p: jnp.sum(fuse.apply(p, q, m, corr) ** 2))(params)
        gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
        assert gnorm > 0


def test_segflow_forward_all_modes():
    """Full model runs with every corr_fuse mode; outputs keep their shapes."""
    video = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1).astype(np.float32))
    for mode in ("concat", "split", "project", "mean1"):
        cfg = SegFlowModelConfig(
            out_encoder_dims=(4, 8, 16),
            d_model=16,
            bottleneck_heads=2,
            dim_feedforward=32,
            corr_radius=(1, 1, 1),
            corr_stride=(1, 1, 1),
            dtype="float32",
            corr_fuse=mode,
        )
        model = SegFlow(cfg=cfg, num_classes=4)
        params = model.init(jax.random.PRNGKey(0), video)
        out = model.apply(params, video)
        assert out["seg_logits"].shape == (2, 16, 16, 4)
        assert out["cum_flow"].shape == (2, 2, 16, 16)
        assert np.isfinite(np.asarray(out["seg_logits"])).all(), mode


def test_split_mode_channel_major_corr_matches():
    """SkipFuse split with the corr in the kernel's native channel-major
    layout (NCHW fuse conv, no transpose glue) must match the channels-last
    path with the SAME params — the _NCHWConv param path/shape is pinned to
    nn.Conv's."""
    from csof_tpu.models.segflow import SkipFuse

    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.rand(1, 12, 12, 8).astype(np.float32))
    m = jnp.asarray(rng.rand(1, 12, 12, 8).astype(np.float32))
    corr = jnp.asarray(rng.rand(1, 12, 12, 9).astype(np.float32))
    fuse = SkipFuse(8, mode="split")
    p = fuse.init(jax.random.PRNGKey(0), q, m, corr)
    y_last = fuse.apply(p, q, m, corr)
    y_cm = fuse.apply(p, q, m, jnp.moveaxis(corr, -1, 1), corr_cm=True)
    np.testing.assert_allclose(
        np.asarray(y_last), np.asarray(y_cm), atol=2e-5, rtol=1e-5
    )


def test_fuse_q_hoist_exactly_matches_in_step_conv():
    """fuse_q_hoist=True (conv_q run once, T-batched, outside the scan) is
    EXACTLY the same math as the in-step conv_q; params map between the two
    layouts with hoist_fuse_q_params. Checked across both temporal paths
    (rolled scan and fully-unrolled loop)."""
    from csof_tpu.models.segflow import hoist_fuse_q_params

    video = jnp.asarray(np.random.RandomState(3).rand(3, 16, 16, 1).astype(np.float32))
    base = dict(
        out_encoder_dims=(4, 8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(1, 1, 1), corr_stride=(1, 1, 1),
        dtype="float32", corr_fuse="split",
    )
    for unroll in (1, 99):  # rolled scan / plain Python loop
        cfg = SegFlowModelConfig(**base, scan_unroll=unroll)
        model = SegFlow(cfg=cfg, num_classes=4)
        params = model.init(jax.random.PRNGKey(0), video)
        out = model.apply(params, video)

        cfg_h = SegFlowModelConfig(**base, scan_unroll=unroll, fuse_q_hoist=True)
        model_h = SegFlow(cfg=cfg_h, num_classes=4)
        params_h = hoist_fuse_q_params(params)
        # mapped tree must exactly match the hoisted model's own init tree
        ref_tree = jax.tree_util.tree_structure(
            model_h.init(jax.random.PRNGKey(1), video)
        )
        assert jax.tree_util.tree_structure(params_h) == ref_tree
        out_h = model_h.apply(params_h, video)
        np.testing.assert_allclose(
            np.asarray(out["seg_logits"]), np.asarray(out_h["seg_logits"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out["cum_flow"]), np.asarray(out_h["cum_flow"]),
            atol=2e-5, rtol=1e-5,
        )


def test_attn_fused_exactly_matches_two_layers():
    """attn_fused=True (the two cross-attention bottlenecks as ONE
    pair-batched call, params stacked on a leading pair axis) is exactly
    the same math as the two serial layers; fuse_bottleneck_params maps the
    unfused checkpoint layout to the fused one. Checked across the rolled
    scan and the fully-unrolled loop."""
    from csof_tpu.models.segflow import fuse_bottleneck_params

    video = jnp.asarray(np.random.RandomState(7).rand(3, 16, 16, 1).astype(np.float32))
    base = dict(
        out_encoder_dims=(4, 8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(1, 1, 1), corr_stride=(1, 1, 1),
        dtype="float32",
    )
    for unroll in (1, 99):
        cfg = SegFlowModelConfig(**base, scan_unroll=unroll)
        model = SegFlow(cfg=cfg, num_classes=4)
        params = model.init(jax.random.PRNGKey(0), video)
        out = model.apply(params, video)

        cfg_f = SegFlowModelConfig(**base, scan_unroll=unroll, attn_fused=True)
        model_f = SegFlow(cfg=cfg_f, num_classes=4)
        params_f = fuse_bottleneck_params(params)
        ref_tree = jax.tree_util.tree_structure(
            model_f.init(jax.random.PRNGKey(1), video)
        )
        assert jax.tree_util.tree_structure(params_f) == ref_tree
        out_f = model_f.apply(params_f, video)
        np.testing.assert_allclose(
            np.asarray(out["seg_logits"]), np.asarray(out_f["seg_logits"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out["cum_flow"]), np.asarray(out_f["cum_flow"]),
            atol=2e-5, rtol=1e-5,
        )


def test_segflow_split_grads_finite():
    """End-to-end split mode (channel-major corr path) trains: finite grads
    through the q_cm + out_cm corr and the NCHW fuse conv."""
    video = jnp.asarray(np.random.RandomState(2).rand(3, 16, 16, 1).astype(np.float32))
    cfg = SegFlowModelConfig(
        out_encoder_dims=(4, 8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(1, 1, 1), corr_stride=(1, 1, 1),
        dtype="float32", corr_fuse="split",
    )
    model = SegFlow(cfg=cfg, num_classes=4)
    params = model.init(jax.random.PRNGKey(0), video)
    g = jax.grad(
        lambda p: (model.apply(p, video)["flow"] ** 2).mean()
        + (model.apply(p, video)["seg_logits"] ** 2).mean()
    )(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_concat_cm_exactly_matches_concat():
    """corr_fuse='concat_cm' (channel-major concat -> NCHW fuse conv,
    sharing one m transpose between the corr kernel and the concat) is
    EXACTLY the same math and the SAME param tree as concat. Checked at the
    full SegFlow level across both temporal paths."""
    video = jnp.asarray(np.random.RandomState(5).rand(3, 16, 16, 1).astype(np.float32))
    base = dict(
        out_encoder_dims=(4, 8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(1, 1, 1), corr_stride=(1, 1, 1),
        dtype="float32",
    )
    for unroll in (1, 99):  # rolled scan / plain Python loop
        cfg = SegFlowModelConfig(**base, scan_unroll=unroll, corr_fuse="concat")
        model = SegFlow(cfg=cfg, num_classes=4)
        params = model.init(jax.random.PRNGKey(0), video)
        out = model.apply(params, video)

        cfg_cm = SegFlowModelConfig(**base, scan_unroll=unroll, corr_fuse="concat_cm")
        model_cm = SegFlow(cfg=cfg_cm, num_classes=4)
        # identical param tree: checkpoints transfer between the modes
        ref_tree = jax.tree_util.tree_structure(
            model_cm.init(jax.random.PRNGKey(1), video)
        )
        assert jax.tree_util.tree_structure(params) == ref_tree
        out_cm_ = model_cm.apply(params, video)
        np.testing.assert_allclose(
            np.asarray(out["seg_logits"]), np.asarray(out_cm_["seg_logits"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out["cum_flow"]), np.asarray(out_cm_["cum_flow"]),
            atol=2e-5, rtol=1e-5,
        )
