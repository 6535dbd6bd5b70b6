"""fused_cm Pallas megakernel vs the concat_cm reference path.

The megakernel (ops/pallas/skipfuse.py) computes corr + concat + fuse conv
+ GroupNorm + LeakyReLU in one kernel with a param tree identical to
concat/concat_cm — these tests pin exact-math parity (up to accumulation
order) on the CPU interpreter, including through the full SegFlow forward
and the vmap batch fold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.models.segflow import SegFlow, SkipFuse
from csof_tpu.ops.correlation import local_correlation_volume


def _mk(c=8, h=16, w=16, f=8, seed=0):
    rng = np.random.RandomState(seed)
    q_cm = jnp.asarray(rng.randn(c, h, w).astype(np.float32) * 0)  # placeholder
    q = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    m = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    return q, m


@pytest.mark.parametrize("radius,stride", [(2, 1), (2, 2), (1, 1)])
def test_fused_matches_concat_cm(radius, stride):
    q, m = _mk()
    f = 8
    q_cm = jnp.moveaxis(q, -1, 0)
    m_cm = jnp.moveaxis(m, -1, 0)

    fused = SkipFuse(f, mode="fused_cm", radius=radius, stride=stride)
    params = fused.init(jax.random.PRNGKey(0), None, None, None,
                        q_cmi=q_cm, m_cmi=m_cm)

    # reference: jnp corr -> concat_cm SkipFuse with the SAME params
    # (paths are identical by construction)
    corr = local_correlation_volume(q, m, radius=radius, stride=stride,
                                    impl="jnp", out_cm=True)
    ref = SkipFuse(f, mode="concat_cm")
    out_ref = ref.apply(params, q[None], m[None], corr[None], corr_cm=True,
                        q_cmi=q_cm[None], m_cmi=m_cm[None])[0]

    out = fused.apply(params, None, None, None, q_cmi=q_cm, m_cmi=m_cm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_concat_cm_bf16():
    q, m = _mk()
    q, m = q.astype(jnp.bfloat16), m.astype(jnp.bfloat16)
    q_cm, m_cm = jnp.moveaxis(q, -1, 0), jnp.moveaxis(m, -1, 0)
    fused = SkipFuse(8, mode="fused_cm", radius=2, stride=1, dtype=jnp.bfloat16)
    params = fused.init(jax.random.PRNGKey(0), None, None, None,
                        q_cmi=q_cm, m_cmi=m_cm)
    corr = local_correlation_volume(q, m, radius=2, stride=1, impl="jnp",
                                    out_cm=True)
    ref = SkipFuse(8, mode="concat_cm", dtype=jnp.bfloat16)
    out_ref = ref.apply(params, q[None], m[None], corr[None], corr_cm=True,
                        q_cmi=q_cm[None], m_cmi=m_cm[None])[0]
    out = fused.apply(params, None, None, None, q_cmi=q_cm, m_cmi=m_cm)
    # bf16 accumulation-order differences only
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_fused_vmap_batches_via_grid():
    b = 3
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, 12, 16, 8).astype(np.float32))
    m = jnp.asarray(rng.randn(b, 12, 16, 8).astype(np.float32))
    q_cm, m_cm = jnp.moveaxis(q, -1, 1), jnp.moveaxis(m, -1, 1)
    fused = SkipFuse(8, mode="fused_cm", radius=2, stride=1)
    params = fused.init(jax.random.PRNGKey(0), None, None, None,
                        q_cmi=q_cm[0], m_cmi=m_cm[0])
    single = [
        fused.apply(params, None, None, None, q_cmi=q_cm[i], m_cmi=m_cm[i])
        for i in range(b)
    ]
    batched = jax.vmap(
        lambda qc, mc: fused.apply(params, None, None, None, q_cmi=qc, m_cmi=mc)
    )(q_cm, m_cm)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single[i]), atol=2e-5,
            rtol=1e-4,
        )


def test_segflow_forward_fused_matches_concat_cm():
    """Full-model parity: identical params, fused_cm vs concat_cm outputs."""
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(3, 16, 16, 1).astype(np.float32))
    kw = dict(
        out_encoder_dims=(8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(2, 2), corr_stride=(1, 1),
        dtype="float32",
    )
    ref_model = SegFlow(cfg=SegFlowModelConfig(corr_fuse="concat_cm", **kw))
    params = ref_model.init(jax.random.PRNGKey(0), video)
    out_ref = ref_model.apply(params, video)

    fused_model = SegFlow(cfg=SegFlowModelConfig(corr_fuse="fused_cm", **kw))
    out = fused_model.apply(params, video)  # same param tree by construction
    for k in ("seg_logits", "flow", "cum_flow", "registered"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_ref[k]), atol=5e-4, rtol=1e-3,
            err_msg=k,
        )


def test_segflow_fused_unrolled_temporal_path():
    """fused_cm under the serving temporal path (fully unrolled) with the
    frame-0 prime specialization."""
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(3, 16, 16, 1).astype(np.float32))
    kw = dict(
        out_encoder_dims=(8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(2, 2), corr_stride=(1, 1),
        dtype="float32",
    )
    ref_model = SegFlow(cfg=SegFlowModelConfig(corr_fuse="concat_cm", **kw))
    params = ref_model.init(jax.random.PRNGKey(0), video)
    out_ref = ref_model.apply(params, video)
    serve = SegFlow(cfg=SegFlowModelConfig(
        corr_fuse="fused_cm", scan_unroll=99, **kw))
    out = serve.apply(params, video)
    for k in ("seg_logits", "cum_flow"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_ref[k]), atol=5e-4, rtol=1e-3,
            err_msg=k,
        )


def test_segflow_fused_sim_sow_matches():
    """The fused path's gated sow (computed via the regular corr path only
    when intermediates are mutable) equals the concat_cm sow."""
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    kw = dict(
        out_encoder_dims=(8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(2, 2), corr_stride=(1, 1),
        dtype="float32",
    )
    ref_model = SegFlow(cfg=SegFlowModelConfig(corr_fuse="concat_cm", **kw))
    params = ref_model.init(jax.random.PRNGKey(0), video)
    _, inter_ref = ref_model.apply(params, video, mutable=["intermediates"])
    fused_model = SegFlow(cfg=SegFlowModelConfig(corr_fuse="fused_cm", **kw))
    _, inter = fused_model.apply(params, video, mutable=["intermediates"])
    ref_leaves = jax.tree_util.tree_leaves(inter_ref)
    leaves = jax.tree_util.tree_leaves(inter)
    assert len(ref_leaves) == len(leaves) and leaves
    for a, b in zip(leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)
