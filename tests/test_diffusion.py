import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.models.diffusion import DDPM, DenoiserUNet, DiffusionConfig, cosine_beta_schedule


@pytest.fixture(scope="module")
def ddpm():
    cfg = DiffusionConfig(timesteps=50, features=(8, 16), time_dim=16, channels=1)
    model = DenoiserUNet(cfg)
    x = jnp.zeros((2, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(2, jnp.int32))
    return DDPM(model, cfg), params


def test_schedule_properties():
    betas = cosine_beta_schedule(100)
    assert betas.shape == (100,)
    assert float(betas.min()) >= 0 and float(betas.max()) <= 0.9995
    ab = jnp.cumprod(1 - betas)
    assert float(ab[-1]) < 0.01  # near-full noise at T


def test_q_sample_interpolates(ddpm):
    d, _ = ddpm
    x0 = jnp.ones((1, 16, 16, 1))
    noise = jnp.zeros_like(x0)
    early = d.q_sample(x0, jnp.array([0]), noise)
    late = d.q_sample(x0, jnp.array([49]), noise)
    assert float(early.mean()) > float(late.mean())  # signal decays


def test_loss_and_grads_finite(ddpm):
    d, params = ddpm
    x0 = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1).astype(np.float32))
    loss, grads = jax.value_and_grad(lambda p: d.loss(p, jax.random.PRNGKey(1), x0))(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_sampling_shape(ddpm):
    d, params = ddpm
    out = d.sample(params, jax.random.PRNGKey(2), (1, 16, 16, 1), steps=10)
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_conditional_denoiser():
    cfg = DiffusionConfig(timesteps=10, features=(8, 16), time_dim=16, channels=1, cond_channels=4)
    model = DenoiserUNet(cfg)
    x = jnp.zeros((1, 16, 16, 1))
    cond = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(1, jnp.int32), cond)
    out = model.apply(params, x, jnp.zeros(1, jnp.int32), cond)
    assert out.shape == (1, 16, 16, 1)
