"""Sliding-window step/aggregation tests.

Ports the *invariants* of the reference's only unit-test file
(ref: tests/test_steps_for_sliding_window_prediction.py) and adds batched
gather/scatter round-trip tests the reference never had.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from csof_tpu.ops.sliding_window import (
    aggregate_patches,
    bucket_image_shape,
    compute_steps,
    extract_patches,
    gaussian_importance_map,
    num_tiles,
    step_grid,
)


def _verify_steps(steps, patch_size, image_size, step_size):
    target = [p * step_size for p in patch_size]
    num = [int(np.ceil((i - p) / t)) + 1 for i, t, p in zip(image_size, target, patch_size)]
    assert [len(s) for s in steps] == num
    for d in range(len(steps)):
        assert steps[d][0] == 0
        assert steps[d][-1] + patch_size[d] == image_size[d]
        for a, b in zip(steps[d], steps[d][1:]):
            assert b <= a + patch_size[d]  # no gaps
            assert a + np.ceil(target[d]) >= b  # spacing <= target


def test_identity_when_patch_equals_image():
    for step_size in (1.0, 0.125, 0.5):
        assert compute_steps((24, 845, 321), (24, 845, 321), step_size) == [[0], [0], [0]]
        assert compute_steps((123, 143), (123, 143), step_size) == [[0], [0]]


def test_manually_verified_combinations():
    # same hand-checked geometries as the reference test
    assert compute_steps((64, 130), (128, 260), 0.5) == [[0, 32, 64], [0, 65, 130]]
    assert compute_steps((20, 320, 256), (30, 320, 256), 0.5) == [[0, 10], [0], [0]]
    assert compute_steps((123, 54, 123), (246, 162, 369), 0.25) == [
        [0, 31, 62, 92, 123],
        [0, 14, 27, 40, 54, 68, 81, 94, 108],
        [0, 31, 62, 92, 123, 154, 184, 215, 246],
    ]


def test_property_sweep_randomized():
    rng = np.random.RandomState(1234)
    for _ in range(1500):
        ndim = rng.randint(1, 4)
        patch = [rng.randint(8, 256) for _ in range(ndim)]
        image = [p + rng.randint(0, 3 * p) for p in patch]
        step = rng.uniform(0.1, 1.0)
        _verify_steps(compute_steps(patch, image, step), patch, image, step)


def test_step_grid_cartesian():
    g = step_grid((64, 130), (128, 260), 0.5)
    assert g.shape == (9, 2)
    assert g[0].tolist() == [0, 0]
    assert g[-1].tolist() == [64, 130]
    assert num_tiles((64, 130), (128, 260), 0.5) == 9


def test_gaussian_map_properties():
    g = gaussian_importance_map((32, 48))
    assert g.shape == (32, 48)
    assert g.dtype == np.float32
    assert g.max() == pytest.approx(1.0)
    assert (g > 0).all()
    # peak at the center voxel
    assert np.unravel_index(np.argmax(g), g.shape) == (16, 24)
    # symmetric around center (up to the floor-center offset)
    assert np.allclose(g[1:, :], g[1:, :][::-1, :], atol=1e-6)


def test_extract_aggregate_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.rand(3, 40, 52).astype(np.float32)
    starts = jnp.asarray(step_grid((16, 16), (40, 52), 0.5))
    patches = extract_patches(jnp.asarray(img), starts, (16, 16))
    assert patches.shape == (starts.shape[0], 3, 16, 16)
    # identity network: aggregating extracted patches and dividing by the
    # weight-sum must reproduce the image exactly
    g = jnp.asarray(gaussian_importance_map((16, 16)))
    agg, wsum = aggregate_patches(patches, starts, (40, 52), g)
    recon = agg / wsum[None]
    np.testing.assert_allclose(np.asarray(recon), img, rtol=1e-5, atol=1e-5)
    # every voxel covered
    assert (np.asarray(wsum) > 0).all()


def test_bucket_image_shape():
    assert bucket_image_shape((37, 100), (48, 48), 0.5, bucket=32) == (48, 128)
    assert bucket_image_shape((48, 48), (48, 48), 0.5, bucket=32) == (48, 48)
