"""Warp / VecInt / jacobian / strain golden tests vs analytic fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.ops.integrate import vecint
from csof_tpu.ops.jacobian import jacobian_determinant, jacobian_stats
from csof_tpu.ops.strain import (
    contour_tracking_error,
    extract_contour_points,
    perimeter,
    strain_curves,
    track_contour,
)
from csof_tpu.ops.warp import (
    compose_flows,
    grid_sample,
    identity_grid,
    resize_flow,
    warp_image,
    warp_points,
    warp_seg_onehot,
)


def test_zero_flow_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(12, 14, 1).astype(np.float32))
    flow = jnp.zeros((12, 14, 2))
    np.testing.assert_allclose(np.asarray(warp_image(img, flow)), np.asarray(img), atol=1e-6)


def test_integer_translation():
    img = jnp.zeros((10, 10, 1)).at[4, 5, 0].set(1.0)
    # backward warp: out(x) = img(x + flow); flow=+1 along axis0 shifts up
    flow = jnp.ones((10, 10, 2)) * jnp.array([1.0, 0.0])
    out = warp_image(img, flow)
    assert out[3, 5, 0] == pytest.approx(1.0)
    assert out[4, 5, 0] == pytest.approx(0.0)


def test_bilinear_halfpixel():
    img = jnp.zeros((8, 8, 1)).at[4, 4, 0].set(1.0)
    flow = jnp.ones((8, 8, 2)) * jnp.array([0.5, 0.0])
    out = warp_image(img, flow)
    assert out[3, 4, 0] == pytest.approx(0.5)
    assert out[4, 4, 0] == pytest.approx(0.5)


def test_zero_padding_outside():
    img = jnp.ones((6, 6, 1))
    flow = jnp.ones((6, 6, 2)) * jnp.array([10.0, 0.0])
    out = warp_image(img, flow, padding="zeros")
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_3d_warp():
    img = jnp.zeros((6, 6, 6, 1)).at[3, 3, 3, 0].set(1.0)
    flow = jnp.ones((6, 6, 6, 3)) * jnp.array([1.0, 0.0, -1.0])
    out = warp_image(img, flow)
    assert out[2, 3, 4, 0] == pytest.approx(1.0)


def test_warp_seg_onehot_semantics():
    seg = jnp.zeros((8, 8), jnp.int32).at[2:6, 2:6].set(2)
    flow = jnp.ones((8, 8, 2)) * jnp.array([1.0, 0.0])
    out = warp_seg_onehot(seg, flow, num_classes=3)
    assert out[1, 3] == 2 and out[5, 3] == 0


def test_warp_points_and_tracking():
    flow = jnp.ones((16, 16, 2)) * jnp.array([2.0, -1.0])
    pts = jnp.array([[4.0, 4.0], [8.0, 8.0]])
    moved = warp_points(pts, flow)
    np.testing.assert_allclose(np.asarray(moved), [[6, 3], [10, 7]], atol=1e-5)
    flows = jnp.stack([flow * 0, flow, flow * 2])
    tracked = track_contour(pts, flows)
    assert tracked.shape == (3, 2, 2)
    np.testing.assert_allclose(np.asarray(tracked[2]), [[8, 2], [12, 6]], atol=1e-4)
    err = contour_tracking_error(tracked, tracked)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


def test_compose_flows():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 1).astype(np.float32))
    f1 = jnp.ones((16, 16, 2)) * jnp.array([1.0, 0.0])
    f2 = jnp.ones((16, 16, 2)) * jnp.array([0.0, 2.0])
    combined = compose_flows(f1, f2)
    a = warp_image(warp_image(img, f1, padding="border"), f2, padding="border")
    b = warp_image(img, combined, padding="border")
    np.testing.assert_allclose(np.asarray(a[2:-2, 2:-2]), np.asarray(b[2:-2, 2:-2]), atol=1e-4)


def test_compose_flows_spatially_varying_order():
    """Contract check with NON-constant fields (constant flows commute and
    would hide an argument swap): warp(img, compose(a, b)) == warp(warp(img,
    a), b), and the reversed composition differs."""
    rng = np.random.RandomState(3)
    n = 24
    img = jnp.asarray(np.cumsum(np.cumsum(rng.rand(n, n, 1), 0), 1).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    a = jnp.asarray(
        np.stack([1.5 * np.sin(2 * np.pi * xx / n), np.cos(2 * np.pi * yy / n)], -1),
        jnp.float32,
    )
    b = jnp.asarray(
        np.stack([0.8 * np.cos(2 * np.pi * yy / n), -1.2 * np.sin(2 * np.pi * xx / n)], -1),
        jnp.float32,
    )
    seq = warp_image(warp_image(img, a, padding="border"), b, padding="border")
    one = warp_image(img, compose_flows(a, b), padding="border")
    inner = (slice(3, -3), slice(3, -3))
    # interpolation error bounds the match (image values span ~[0, 290]);
    # the swapped order is an order of magnitude further off
    np.testing.assert_allclose(np.asarray(seq[inner]), np.asarray(one[inner]), atol=1.0)
    swapped = warp_image(img, compose_flows(b, a), padding="border")
    assert np.abs(np.asarray(seq[inner]) - np.asarray(swapped[inner])).max() > 3.0


def test_vecint_small_field_exponential():
    # For a constant velocity field, integration = identity displacement
    # (constant field composes with itself: phi(x) = x + v)
    v = jnp.ones((12, 12, 2)) * jnp.array([0.6, -0.4])
    disp = vecint(v, num_steps=6)
    inner = disp[3:-3, 3:-3]
    np.testing.assert_allclose(np.asarray(inner), np.array([0.6, -0.4]) * np.ones((6, 6, 2)), atol=1e-3)


def test_jacobian_affine_field():
    # disp = A@x - x with A = diag(1.2, 0.8) -> det J = 0.96 everywhere
    grid = identity_grid((16, 16))
    disp = grid * jnp.array([0.2, -0.2])
    det = jacobian_determinant(disp)
    np.testing.assert_allclose(np.asarray(det), 1.2 * 0.8, atol=1e-4)
    stats = jacobian_stats(disp)
    assert float(stats["pct_negative_j"]) == 0.0
    assert float(stats["abs_mean_j_minus_1"]) == pytest.approx(abs(0.96 - 1), abs=1e-4)


def test_jacobian_zero_disp():
    det = jacobian_determinant(jnp.zeros((8, 8, 8, 3)))
    np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-6)


def test_perimeter_square():
    m = jnp.zeros((32, 32), bool).at[8:24, 8:24].set(True)
    p = float(perimeter(m))
    # 16x16 square: true perimeter 60 (border pixel count 4*15); the weighted
    # estimator gives ~60 for axis-aligned squares
    assert 55 <= p <= 65


def test_perimeter_matches_circle():
    yy, xx = np.mgrid[:64, :64]
    m = ((yy - 32) ** 2 + (xx - 32) ** 2) <= 20**2
    p = float(perimeter(jnp.asarray(m)))
    assert abs(p - 2 * np.pi * 20) / (2 * np.pi * 20) < 0.1


def test_strain_curves_expanding_circle():
    yy, xx = np.mgrid[:64, :64]
    frames = []
    radii = [10, 12, 14]
    for r in radii:
        f = np.zeros((64, 64), np.int32)
        f[((yy - 32) ** 2 + (xx - 32) ** 2) <= r**2] = 3  # endo
        ring = (((yy - 32) ** 2 + (xx - 32) ** 2) <= (r + 4) ** 2) & ~(
            ((yy - 32) ** 2 + (xx - 32) ** 2) <= r**2
        )
        f[ring] = 2  # myo
        frames.append(f)
    curves = strain_curves(jnp.asarray(np.stack(frames)))
    lv = np.asarray(curves["lv"])
    assert lv[0] == pytest.approx(0.0)
    # radius 10->12->14 is +20%/+40% perimeter; endo/epi average similar
    assert 10 < lv[1] < 30
    assert 25 < lv[2] < 55
    assert lv[2] > lv[1]


def test_extract_contour_points():
    m = np.zeros((32, 32), bool)
    m[10:20, 10:20] = True
    pts = extract_contour_points(m, max_points=64)
    assert pts.shape == (64, 2)
    assert pts.min() >= 10 and pts.max() <= 19


def test_resize_flow_rescales_magnitude():
    flow = jnp.ones((8, 8, 2))
    out = resize_flow(flow, (16, 16))
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_grid_sample_mxu_matches_gather():
    """The two-hot-selector MXU bilinear path must equal the corner-gather
    reference for zeros and border padding, including out-of-range coords."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from csof_tpu.ops import warp as W

    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(48, 40, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-6, 52, (33, 29, 2)).astype(np.float32))
    for padding in ("zeros", "border"):
        os.environ["CSOF_WARP_IMPL"] = "gather"
        ref = W.grid_sample(img, coords, padding=padding)
        os.environ["CSOF_WARP_IMPL"] = "mxu"
        try:
            # force the fast path despite the small-n gate
            orig = W._use_mxu_sample
            W._use_mxu_sample = lambda *a: True
            fast = W.grid_sample(img, coords, padding=padding)
        finally:
            W._use_mxu_sample = orig
            os.environ.pop("CSOF_WARP_IMPL", None)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(ref), atol=2e-5,
            err_msg=f"padding={padding}",
        )
