"""Correlation-volume ops + RAFT model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import RaftModelConfig
from csof_tpu.models.raft import RAFT, convex_upsample
from csof_tpu.ops.correlation import (
    all_pairs_correlation,
    correlation_pyramid,
    local_correlation_volume,
    lookup_correlation,
)


def test_all_pairs_correlation_values():
    f1 = jnp.zeros((2, 2, 4)).at[0, 0].set(jnp.ones(4))
    f2 = jnp.zeros((2, 2, 4)).at[1, 1].set(jnp.ones(4) * 2)
    corr = all_pairs_correlation(f1, f2)
    assert corr.shape == (2, 2, 2, 2)
    assert float(corr[0, 0, 1, 1]) == pytest.approx(8 / 2.0)  # 4*2 / sqrt(4)
    assert float(corr[0, 0, 0, 0]) == 0.0


def test_correlation_pyramid_shapes_and_pooling():
    corr = jnp.ones((4, 4, 8, 8))
    pyr = correlation_pyramid(corr, num_levels=3)
    assert [p.shape for p in pyr] == [(4, 4, 8, 8), (4, 4, 4, 4), (4, 4, 2, 2)]
    np.testing.assert_allclose(np.asarray(pyr[2]), 1.0, atol=1e-6)


def test_lookup_correlation_center_match():
    # identical feature maps: the zero-displacement lookup at level 0 center
    # equals the self-correlation peak
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(6, 6, 8).astype(np.float32))
    corr = all_pairs_correlation(f, f)
    pyr = correlation_pyramid(corr, 2)
    from csof_tpu.ops.warp import identity_grid

    coords = identity_grid((6, 6))
    r = 2
    feats = lookup_correlation(pyr, coords, radius=r)
    assert feats.shape == (6, 6, 2 * (2 * r + 1) ** 2)
    k = (2 * r + 1) ** 2
    center = feats[..., k // 2]  # level-0, (0,0) offset
    expected = jnp.einsum("hwc,hwc->hw", f, f) / jnp.sqrt(8.0)
    np.testing.assert_allclose(np.asarray(center), np.asarray(expected), atol=1e-4)


def test_lookup_onehot_matches_gather_reference():
    """The MXU one-hot-matmul lookup must equal the gather implementation
    (zero-padded bilinear window sampling) for arbitrary fractional coords,
    including windows hanging off / fully outside the volume."""
    from csof_tpu.ops.correlation import lookup_correlation_gather

    rng = np.random.RandomState(3)
    h = w = 6
    corr = jnp.asarray(rng.randn(h, w, h, w).astype(np.float32))
    pyr = correlation_pyramid(corr, 2)
    # coords spanning in-range, fractional, far out-of-range
    coords = jnp.asarray(rng.uniform(-8, 14, (h, w, 2)).astype(np.float32))
    a = lookup_correlation(pyr, coords, radius=2)
    b = lookup_correlation_gather(pyr, coords, radius=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_local_correlation_volume_shift_detection():
    rng = np.random.RandomState(1)
    # zero-mean features so self-correlation peaks sharply
    q = jnp.asarray((rng.rand(8, 8, 16) - 0.5).astype(np.float32))
    # memory = query shifted by +1 along axis 0
    m = jnp.roll(q, 1, axis=0)
    vol = local_correlation_volume(q, m, radius=2, stride=1)
    assert vol.shape == (8, 8, 25)
    # the (dy=+1, dx=0) offset should be the max-correlation channel in the
    # interior: m[h+1] == q[h]
    k_idx = (1 + 2) * 5 + (0 + 2)
    interior = np.asarray(vol)[2:-2, 2:-2]
    best = interior.argmax(axis=-1)
    assert (best == k_idx).mean() > 0.9


def test_convex_upsample_constant_flow():
    flow = jnp.ones((4, 4, 2))
    mask = jnp.zeros((4, 4, 64 * 9))
    up = convex_upsample(flow, mask, factor=8)
    assert up.shape == (32, 32, 2)
    # uniform mask -> convex combo of identical (scaled) values = 8.0 in the
    # interior (borders mix in the zero padding, as in RAFT's unfold)
    np.testing.assert_allclose(np.asarray(up)[8:-8, 8:-8], 8.0, atol=1e-5)


@pytest.mark.slow
def test_raft_forward_shapes():
    cfg = RaftModelConfig(iters=2, corr_levels=2, corr_radius=2, hidden_dim=32,
                          context_dim=32, feature_dim=32, dtype="float32")
    model = RAFT(cfg)
    x1 = jnp.zeros((32, 32, 1))
    x2 = jnp.zeros((32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x1, x2)
    flows = model.apply(params, x1, x2)
    assert flows.shape == (2, 32, 32, 2)
    assert np.isfinite(np.asarray(flows)).all()


@pytest.mark.slow
def test_raft_scan_unroll_parity():
    """cfg.scan_unroll is a pure serving lever: identical params and
    bit-identical outputs for any unroll factor (nn.scan lifted transform)."""
    kw = dict(iters=4, corr_levels=2, corr_radius=2, hidden_dim=32,
              context_dim=32, feature_dim=32, dtype="float32")
    rolled = RAFT(RaftModelConfig(**kw))
    unrolled = RAFT(RaftModelConfig(**kw, scan_unroll=4))
    x1 = jnp.asarray(np.random.RandomState(0).rand(32, 32, 1), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(1).rand(32, 32, 1), jnp.float32)
    params = rolled.init(jax.random.PRNGKey(0), x1, x2)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        unrolled.init(jax.random.PRNGKey(0), x1, x2)
    )
    np.testing.assert_allclose(
        np.asarray(unrolled.apply(params, x1, x2)),
        np.asarray(rolled.apply(params, x1, x2)),
        atol=1e-5,
    )
