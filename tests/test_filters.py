import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter1d

from csof_tpu.ops.filters import gaussian_kernel_1d, gaussian_smooth


def test_kernel_normalized():
    k = gaussian_kernel_1d(1.5)
    assert float(jnp.sum(k)) == pytest.approx(1.0, abs=1e-6)
    assert k.shape[0] == 2 * 5 + 1  # radius = ceil(3*1.5)


def test_matches_scipy_interior():
    rng = np.random.RandomState(0)
    x = rng.rand(64).astype(np.float32)
    ours = np.asarray(gaussian_smooth(jnp.asarray(x)[None], 2.0, axes=(1,)))[0]
    ref = gaussian_filter1d(x, 2.0, mode="nearest")
    np.testing.assert_allclose(ours[8:-8], ref[8:-8], atol=1e-3)


def test_2d_smooth_reduces_variance():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(32, 32).astype(np.float32))
    y = gaussian_smooth(x, 1.0)
    assert float(jnp.var(y)) < float(jnp.var(x))
    assert float(jnp.mean(y)) == pytest.approx(float(jnp.mean(x)), abs=1e-2)
