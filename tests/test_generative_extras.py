"""Generative-branch extras: latent diffusion, ControlNet, swin GAN,
temporal video model (VERDICT missing item 4;
ref: nnMTLTrainerV2Flow_StableDiffusion.py / nnMTLTrainerV2Flow_ControlNet.py
/ lib/swin_gan.py / network_architecture/temporal_model.py:822)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from csof_tpu.models.diffusion import DiffusionConfig
from csof_tpu.models.generative import (
    ControlledDenoiserUNet,
    KLAutoencoder,
    LatentDiffusion,
    SwinDiscriminator,
    SwinGenerator,
    controlnet_param_labels,
)
from csof_tpu.models.temporal import TemporalVideoSegModel
from csof_tpu.training.generative import (
    make_controlnet_optimizer,
    make_controlnet_train_step,
    make_gan_train_steps,
    make_ldm_train_step,
)


def test_kl_autoencoder_roundtrip():
    ae = KLAutoencoder(features=(8, 16), latent_dim=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    params = ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    out = ae.apply(params, x, jax.random.PRNGKey(2))
    assert out["reconstruction"].shape == x.shape
    assert out["mu"].shape == (2, 4, 4, 4)
    assert float(out["kl"]) >= 0


def test_latent_diffusion_train_step():
    ae = KLAutoencoder(features=(8, 16), latent_dim=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    cfg = DiffusionConfig(timesteps=10, features=(8, 16), time_dim=16, channels=4)
    ldm = LatentDiffusion(ae, cfg)
    latents = ldm.encode_latents(ae_params, jax.random.PRNGKey(2), x)
    assert latents.shape == (2, 4, 4, 4)
    dn_params = ldm.denoiser.init(
        jax.random.PRNGKey(3), latents, jnp.zeros((2,), jnp.int32)
    )
    tx = optax.adam(1e-3)
    step = make_ldm_train_step(ldm, tx)
    p, o, loss = step(dn_params, tx.init(dn_params), ae_params, jax.random.PRNGKey(4), x)
    assert np.isfinite(float(loss))
    # sampling decodes back to image space
    img = ldm.sample(p, ae_params, jax.random.PRNGKey(5), (1, 4, 4, 4), steps=3)
    assert img.shape == (1, 16, 16, 1)


def test_controlnet_zero_init_and_freeze():
    cfg = DiffusionConfig(timesteps=10, features=(8, 16), time_dim=16, channels=1)
    model = ControlledDenoiserUNet(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    hint = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, hint)
    # zero convs -> the hint has NO effect at init (exact ControlNet property)
    out1 = model.apply(params, x, t, hint)
    out2 = model.apply(params, x, t, jnp.zeros_like(hint))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)

    from csof_tpu.models.diffusion import DDPM

    ddpm = DDPM(model, cfg)
    tx, opt_state = make_controlnet_optimizer(params)
    step = make_controlnet_train_step(model, ddpm, tx)
    new_params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1), x, hint)
    assert np.isfinite(float(loss))
    # frozen base params unchanged, control branch updated
    labels = controlnet_param_labels(new_params)
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_params
    )
    flat_moved = {
        jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(moved)
    }
    flat_labels = {
        jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(labels)
    }
    for k, lbl in flat_labels.items():
        if lbl == "frozen":
            assert flat_moved[k] == 0.0, f"frozen param {k} moved"
    assert any(v > 0 for k, v in flat_moved.items() if flat_labels[k] == "control")


@pytest.mark.slow
def test_swin_gan_steps():
    gen = SwinGenerator(features=(16, 8), base_hw=4, num_heads=2, window=2)
    disc = SwinDiscriminator(features=(8, 16), num_heads=2, window=2)
    real = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    z = jnp.zeros((2, 16))
    g_params = gen.init(jax.random.PRNGKey(0), z)
    fake = gen.apply(g_params, z)
    assert fake.shape == (2, 16, 16, 1)
    d_params = disc.init(jax.random.PRNGKey(1), real)
    g_tx, d_tx = optax.adam(1e-4), optax.adam(1e-4)
    d_step, g_step = make_gan_train_steps(gen, disc, g_tx, d_tx)
    d_params, d_opt, d_loss = d_step(
        d_params, d_tx.init(d_params), g_params, jax.random.PRNGKey(2), real
    )
    g_params, g_opt, g_loss = g_step(
        g_params, g_tx.init(g_params), d_params, jax.random.PRNGKey(3), 2
    )
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))


def test_temporal_video_seg_model():
    model = TemporalVideoSegModel(
        out_encoder_dims=(4, 8), d_model=8, num_classes=4, num_heads=2,
        video_length=6,
    )
    video = jnp.asarray(np.random.RandomState(0).rand(5, 16, 16, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)
    logits = model.apply(params, video)
    assert logits.shape == (5, 16, 16, 4)
    assert np.isfinite(np.asarray(logits)).all()
    # shared decoder params: same param tree works for a different T
    logits7 = model.apply(params, jnp.zeros((6, 16, 16, 1)))
    assert logits7.shape == (6, 16, 16, 4)
