"""SegFlow fully-unrolled temporal loop vs nn.scan parity.

scan_unroll > T switches the temporal recurrence to a plain Python loop
(no lax.while/scan op at all), because the scan boundary pins layouts and
measured 3-5x slower than the identical straight-line program
(docs/BENCHMARKS.md round 3).  The unrolled step module is name-pinned to
nn.scan's auto-name so the param tree — and therefore every checkpoint —
is identical between the two paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.models.segflow import SegFlow


def _cfg(unroll, remat=False, **kw):
    return SegFlowModelConfig(
        out_encoder_dims=(4, 8, 16),
        d_model=16,
        bottleneck_heads=2,
        dim_feedforward=32,
        corr_radius=(1, 1, 1),
        corr_stride=(1, 1, 1),
        dtype="float32",
        deep_supervision=False,
        scan_unroll=unroll,
        remat=remat,
        **kw,
    )


@pytest.mark.parametrize("remat", [False, True])
def test_unrolled_matches_scan(remat):
    video = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 1).astype(np.float32))
    scan_model = SegFlow(cfg=_cfg(1, remat), num_classes=3)
    unroll_model = SegFlow(cfg=_cfg(99, remat), num_classes=3)
    params = scan_model.init(jax.random.PRNGKey(0), video)
    # identical param tree: checkpoints transfer between the two paths
    p2 = unroll_model.init(jax.random.PRNGKey(0), video)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    out_scan = scan_model.apply(params, video)
    out_unroll = unroll_model.apply(params, video)
    assert set(out_scan) == set(out_unroll)
    for k in ("seg_logits", "flow", "cum_flow", "registered"):
        a, b = np.asarray(out_scan[k]), np.asarray(out_unroll[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-5, err_msg=k)


def test_while1_matches_scan():
    """scan_while1 (the full prime+unrolled loop inside ONE length-1
    nn.scan trip) is exactly the scan path's math with the loop path's
    frame-0 prime — and the SAME param tree as both."""
    video = jnp.asarray(np.random.RandomState(2).rand(4, 16, 16, 1).astype(np.float32))
    scan_model = SegFlow(cfg=_cfg(1), num_classes=3)
    w1_model = SegFlow(cfg=_cfg(1, scan_while1=True), num_classes=3)
    params = scan_model.init(jax.random.PRNGKey(0), video)
    p2 = w1_model.init(jax.random.PRNGKey(0), video)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    out_scan = scan_model.apply(params, video)
    out_w1 = w1_model.apply(params, video)
    assert set(out_scan) == set(out_w1)
    for k in ("seg_logits", "flow", "cum_flow", "registered"):
        a, b = np.asarray(out_scan[k]), np.asarray(out_w1[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-5, err_msg=k)


def test_unrolled_grads_match_scan():
    video = jnp.asarray(np.random.RandomState(1).rand(3, 16, 16, 1).astype(np.float32))
    scan_model = SegFlow(cfg=_cfg(1), num_classes=3)
    unroll_model = SegFlow(cfg=_cfg(99), num_classes=3)
    params = scan_model.init(jax.random.PRNGKey(0), video)

    def loss(model):
        def f(p):
            o = model.apply(p, video)
            return (o["flow"].astype(jnp.float32) ** 2).mean() + (
                o["seg_logits"].astype(jnp.float32) ** 2
            ).mean()
        return f

    g_scan = jax.grad(loss(scan_model))(params)
    g_unroll = jax.grad(loss(unroll_model))(params)
    flat_s = jax.tree_util.tree_leaves_with_path(g_scan)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(g_unroll))
    for k, a in flat_s:
        b = flat_u[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k),
        )
