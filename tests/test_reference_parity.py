"""Numerical parity against the REFERENCE torch implementation (CPU).

Loads the reference's pure-torch modules directly from /root/reference
(ref: nnunet/network_architecture/integration.py — SpatialTransformer,
VecInt, SpatialTransformerContour) and checks our jax ops reproduce them on
random inputs. This is the strongest form of capability evidence: same
inputs, same outputs, different framework.
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from csof_tpu.ops.integrate import vecint
from csof_tpu.ops.warp import warp_image, warp_points


@pytest.fixture(scope="module")
def ref_integration():
    spec = importlib.util.spec_from_file_location(
        "ref_integration", "/root/reference/nnunet/network_architecture/integration.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _ref_warp(ref_mod, image_hw, flow_hw2, mode="bilinear"):
    """Run the reference SpatialTransformer: (H, W) image + (H, W, 2) flow.

    The reference stores flow channels-first (N, 2, H, W) with flow[:, 0]
    indexing the first spatial axis (its grid is built with torch.arange per
    dim and new_locs normalized per dim)."""
    h, w = image_hw.shape
    st = ref_mod.SpatialTransformer((h, w), mode=mode)
    src = torch.from_numpy(image_hw)[None, None].float()
    flow = torch.from_numpy(np.moveaxis(flow_hw2, -1, 0))[None].float()
    with torch.no_grad():
        out = st(flow, src)  # ref signature: forward(flow, original)
    return out[0, 0].numpy()


def test_spatial_transformer_parity(ref_integration):
    rng = np.random.RandomState(0)
    img = rng.rand(24, 24).astype(np.float32)
    flow = (rng.rand(24, 24, 2).astype(np.float32) - 0.5) * 4
    ref_out = _ref_warp(ref_integration, img, flow)
    ours = np.asarray(warp_image(jnp.asarray(img)[..., None], jnp.asarray(flow)))[..., 0]
    np.testing.assert_allclose(ours, ref_out, atol=2e-4)


def test_spatial_transformer_parity_nearest(ref_integration):
    rng = np.random.RandomState(3)
    img = (rng.rand(16, 16) > 0.5).astype(np.float32)
    flow = (rng.rand(16, 16, 2).astype(np.float32) - 0.5) * 3
    ref_out = _ref_warp(ref_integration, img, flow, mode="nearest")
    ours = np.asarray(
        warp_image(jnp.asarray(img)[..., None], jnp.asarray(flow), mode="nearest")
    )[..., 0]
    # nearest ties at exact .5 offsets may differ; demand 99% agreement
    agree = (ours == ref_out).mean()
    assert agree > 0.99, f"nearest-mode agreement {agree}"


def test_vecint_parity(ref_integration):
    rng = np.random.RandomState(1)
    vel = (rng.rand(20, 20, 2).astype(np.float32) - 0.5) * 2
    ref_vi = ref_integration.VecInt((20, 20), 7)
    with torch.no_grad():
        ref_out = ref_vi(torch.from_numpy(np.moveaxis(vel, -1, 0))[None].float())
    ref_out = np.moveaxis(ref_out[0].numpy(), 0, -1)
    ours = np.asarray(vecint(jnp.asarray(vel), num_steps=7))
    # interiors must match closely (borders differ: ref grid_sample zero-pads
    # the flow field itself during integration, we clamp)
    np.testing.assert_allclose(ours[3:-3, 3:-3], ref_out[3:-3, 3:-3], atol=5e-3)


def test_contour_transformer_parity(ref_integration):
    rng = np.random.RandomState(2)
    flow = (rng.rand(32, 32, 2).astype(np.float32) - 0.5) * 6
    pts = rng.rand(10, 2).astype(np.float32) * 28 + 2

    # ref SpatialTransformerContour.forward(new_locs, original): samples
    # `original` at absolute positions new_locs (B, 2, P, 1) with channel 0
    # normalized by shape[~0] (x / W-1) and channel 1 by (y / H-1) — i.e.
    # channel 0 = x, channel 1 = y, no reversal (ref: integration.py:16-34).
    st = ref_integration.SpatialTransformerContour((32, 32))
    new_locs = torch.zeros((1, 2, pts.shape[0], 1))
    new_locs[0, 0, :, 0] = torch.from_numpy(pts[:, 1])  # x
    new_locs[0, 1, :, 0] = torch.from_numpy(pts[:, 0])  # y
    flow_t = torch.from_numpy(np.moveaxis(flow, -1, 0))[None].float()  # (1, 2(y,x), H, W)
    with torch.no_grad():
        sampled = st(new_locs, flow_t)[0, :, :, 0].numpy()  # (2(y,x), P)
    ref_pts = pts + sampled.T
    ours = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(flow)))
    np.testing.assert_allclose(ours, ref_pts, atol=1e-3)


def test_spatial_transformer_parity_3d(ref_integration):
    rng = np.random.RandomState(5)
    img = rng.rand(10, 12, 14).astype(np.float32)
    flow = (rng.rand(10, 12, 14, 3).astype(np.float32) - 0.5) * 3
    st = ref_integration.SpatialTransformer((10, 12, 14))
    src = torch.from_numpy(img)[None, None].float()
    fl = torch.from_numpy(np.moveaxis(flow, -1, 0))[None].float()
    with torch.no_grad():
        ref_out = st(fl, src)[0, 0].numpy()
    ours = np.asarray(warp_image(jnp.asarray(img)[..., None], jnp.asarray(flow)))[..., 0]
    np.testing.assert_allclose(ours, ref_out, atol=3e-4)


def test_vecint_parity_3d(ref_integration):
    rng = np.random.RandomState(6)
    vel = (rng.rand(8, 10, 10, 3).astype(np.float32) - 0.5) * 1.5
    ref_vi = ref_integration.VecInt((8, 10, 10), 7)
    with torch.no_grad():
        ref_out = ref_vi(torch.from_numpy(np.moveaxis(vel, -1, 0))[None].float())
    ref_out = np.moveaxis(ref_out[0].numpy(), 0, -1)
    ours = np.asarray(vecint(jnp.asarray(vel), num_steps=7))
    np.testing.assert_allclose(ours[2:-2, 2:-2, 2:-2], ref_out[2:-2, 2:-2, 2:-2], atol=5e-3)
