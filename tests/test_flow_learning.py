"""Learning sanity: the registration objective actually improves on a
synthetic translating pattern (capability analogue of the reference's
convergence expectation for its unsupervised NCC training)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from csof_tpu.config.experiment import VoxelMorphModelConfig
from csof_tpu.models.voxelmorph import VoxelMorph
from csof_tpu.ops.losses import ncc_loss, spatial_gradient_penalty
import pytest


def test_voxelmorph_learns_translation():
    rng = np.random.RandomState(0)
    base = rng.rand(24, 24).astype(np.float32)
    from scipy.ndimage import gaussian_filter, shift

    base = gaussian_filter(base, 2.0)  # smooth so NCC has gradients
    fixed = base
    moving = shift(base, (2.0, 0.0), order=1)

    model = VoxelMorph(VoxelMorphModelConfig(
        enc_features=(8, 16, 16), dec_features=(16, 16, 8, 8), diffeomorphic=False,
        dtype="float32",
    ))
    m = jnp.asarray(moving)[None, ..., None]
    f = jnp.asarray(fixed)[None, ..., None]
    params = model.init(jax.random.PRNGKey(0), m, f)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, m, f)
            return ncc_loss(out["registered"], f, window=7) + 0.1 * spatial_gradient_penalty(out["flow"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"
    # learned flow should point along +y (moving shifted +2 in axis0 means
    # backward warp needs flow ~ -2... sign: registered(x)=moving(x+flow);
    # moving(x) = base(x-2) so flow ≈ +2 aligns registered with base? check
    # magnitude only: mean |flow_y| in the interior should be ~2
    out = model.apply(params, m, f)
    inner = np.asarray(out["flow"])[0, 8:-8, 8:-8, 0]
    assert abs(abs(inner.mean()) - 2.0) < 1.5, f"flow_y mean {inner.mean():.2f}"


@pytest.mark.slow
def test_voxelmorph_3d_registration_learns():
    """3D flow capability (ref: lib/decoder_alt.py:1284 Decoder3D / :2203
    FlowDecoder3D): the same VoxelMorph module on a (N, D, H, W, C) volume
    emits a 3-component diffeomorphic flow and reduces NCC on a translated
    smooth phantom."""
    rng = np.random.RandomState(1)
    from scipy.ndimage import gaussian_filter, shift

    base = gaussian_filter(rng.rand(8, 16, 16).astype(np.float32), 1.5)
    fixed = base
    moving = shift(base, (0.0, 1.5, 0.0), order=1)

    model = VoxelMorph(VoxelMorphModelConfig(
        enc_features=(4, 8, 8), dec_features=(8, 8, 4, 4), diffeomorphic=True,
        int_steps=5, dtype="float32",
    ))
    m = jnp.asarray(moving)[None, ..., None]
    f = jnp.asarray(fixed)[None, ..., None]
    params = model.init(jax.random.PRNGKey(0), m, f)
    out0 = model.apply(params, m, f)
    assert out0["flow"].shape == (1, 8, 16, 16, 3)
    assert "flow_inverse" in out0 and "velocity" in out0
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, m, f)
            return ncc_loss(out["registered"], f, window=5) + 0.1 * spatial_gradient_penalty(out["flow"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(25):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.85, f"no 3D learning: {losses[0]:.3f} -> {losses[-1]:.3f}"
