"""C++ data-plane core: build, bind, compare against numpy fallback."""

import numpy as np
import pytest

from csof_tpu.native import (
    extract_patches_2d,
    extract_patches_3d,
    minmax_normalize,
    native_available,
    one_hot,
    zscore_normalize,
)
from csof_tpu.native.bindings import _extract_fallback


def test_native_builds():
    assert native_available(), "g++ build of libcsof_native.so failed"


def test_extract_3d_matches_fallback():
    rng = np.random.RandomState(0)
    src = rng.rand(2, 10, 20, 20).astype(np.float32)
    centers = np.array([[5, 10, 10], [0, 0, 0], [9, 19, 19], [5, -2, 25]], np.int64)
    patch = (4, 8, 8)
    out = extract_patches_3d(src, centers, patch)
    ref = _extract_fallback(src, centers, np.asarray(patch), np.empty_like(out))
    np.testing.assert_allclose(out, ref)
    # center patch content check
    np.testing.assert_allclose(out[0], src[:, 3:7, 6:14, 6:14])


def test_extract_2d_matches_fallback():
    rng = np.random.RandomState(1)
    src = rng.rand(3, 32, 32).astype(np.float32)
    centers = np.array([[16, 16], [0, 31], [31, 0]], np.int64)
    patch = (8, 8)
    out = extract_patches_2d(src, centers, patch)
    ref = _extract_fallback(src, centers, np.asarray(patch), np.empty_like(out))
    np.testing.assert_allclose(out, ref)


def test_minmax_and_zscore():
    rng = np.random.RandomState(2)
    x = (rng.rand(4, 16, 16).astype(np.float32) * 50 + 10).copy()
    y = x.copy()
    minmax_normalize(x)
    assert x.min() == pytest.approx(0.0, abs=1e-6)
    assert x.max() == pytest.approx(1.0, abs=1e-3)
    zscore_normalize(y)
    for i in range(4):
        assert abs(y[i].mean()) < 1e-3
        assert abs(y[i].std() - 1) < 1e-2


def test_one_hot():
    labels = np.array([[0, 1], [2, -1]], np.int32)
    oh = one_hot(labels, 3)
    assert oh.shape == (2, 2, 3)
    assert oh[0, 1, 1] == 1 and oh[1, 1].sum() == 0


def test_native_patch_throughput_sane():
    """Native path handles a realistic batch quickly (smoke perf check)."""
    import time

    rng = np.random.RandomState(0)
    src = rng.rand(1, 12, 256, 256).astype(np.float32)
    centers = np.stack([rng.randint(0, 12, 256), rng.randint(0, 256, 256), rng.randint(0, 256, 256)], 1)
    t0 = time.perf_counter()
    out = extract_patches_3d(src, centers, (4, 64, 64))
    dt = time.perf_counter() - t0
    assert out.shape == (256, 1, 4, 64, 64)
    assert dt < 2.0, f"native patch gather too slow: {dt:.3f}s"
