"""UDA adversarial adaptation + REINFORCE rotation search."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from csof_tpu.models.discriminator import PatchDiscriminator
from csof_tpu.models.unet import GenericUNet
from csof_tpu.training.policy_search import PolicyNet, interval_to_angle, make_reinforce_step
from csof_tpu.training.uda import init_uda_state, make_uda_step


def test_uda_step_runs_and_losses_finite():
    net = GenericUNet(num_classes=2, base_num_features=4,
                      pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                      deep_supervision=False)
    seg_apply = lambda p, x: net.apply(p, x)
    seg_params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    disc = PatchDiscriminator(features=(8, 16))
    seg_tx = optax.adam(1e-3)
    disc_tx = optax.adam(1e-4)
    state = init_uda_state(seg_params, disc, jnp.zeros((2, 16, 16, 2)), seg_tx, disc_tx,
                           jax.random.PRNGKey(1))
    step = jax.jit(make_uda_step(seg_apply, disc, seg_tx, disc_tx))
    rng = np.random.RandomState(0)
    batch = {
        "source": jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32)),
        "source_seg": jnp.asarray((rng.rand(2, 16, 16) > 0.5).astype(np.int32)),
        "target": jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32) + 1.0),
    }
    m0 = None
    for _ in range(3):
        state, metrics = step(state, batch)
        m0 = metrics
    assert all(np.isfinite(float(v)) for v in m0.values())
    assert float(m0["disc_loss"]) > 0


def test_interval_to_angle_range():
    a = interval_to_angle(jnp.arange(20, dtype=jnp.float32), 20)
    assert float(a.min()) == pytest.approx(-np.pi)
    assert float(a.max()) < np.pi


def test_reinforce_learns_preferred_rotation():
    """Reward peaks at bin 5; the policy should concentrate there."""
    policy = PolicyNet(num_intervals=8, features=4)
    x = jnp.zeros((16, 8, 8, 1))
    params = policy.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(5e-2)
    opt_state = tx.init(params)
    target_angle = interval_to_angle(jnp.float32(5), 8)

    def reward_fn(xb, angle):
        return -jnp.abs(angle - target_angle)

    step = jax.jit(make_reinforce_step(policy, reward_fn, tx))
    baseline = jnp.float32(0.0)
    key = jax.random.PRNGKey(42)
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt_state, baseline, metrics = step(params, opt_state, baseline, k, x)
    logits = policy.apply(params, x)
    assert int(jnp.argmax(logits[0])) == 5
