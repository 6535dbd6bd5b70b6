"""REINFORCE rotation search (the reference's experimental PolicyNet).

Capability parity with ref: nnunet/network_architecture/MTL_model.py:1298
(`PolicyNet` — an RL agent that searches over rotation intervals to maximize
segmentation quality; config keys reinforcement/policy_net_learning_rate/
number_of_intervals/number_of_steps in ref: nnunet/adversarial_acdc.yaml):
a categorical policy over K rotation bins trained with REINFORCE against a
black-box reward (e.g. prediction confidence or dice of the rotated input).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class PolicyNet(nn.Module):
    """Tiny conv encoder -> categorical logits over rotation intervals."""

    num_intervals: int = 20
    features: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (N, H, W, C) -> (N, num_intervals) logits."""
        h = nn.Conv(self.features, (3, 3), strides=(2, 2))(x)
        h = nn.relu(h)
        h = nn.Conv(self.features * 2, (3, 3), strides=(2, 2))(h)
        h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_intervals)(h)


def interval_to_angle(interval: jnp.ndarray, num_intervals: int) -> jnp.ndarray:
    """Bin index -> rotation angle in radians over the full circle."""
    return (interval / num_intervals) * 2 * jnp.pi - jnp.pi


def make_reinforce_step(
    policy: PolicyNet,
    reward_fn: Callable,  # (x (N,H,W,C), angle (N,)) -> reward (N,)
    tx: optax.GradientTransformation,
    baseline_decay: float = 0.9,
):
    """One REINFORCE update: sample rotation bins, score with `reward_fn`,
    ascend log-prob * advantage with a running baseline."""

    def step(params, opt_state, baseline, key, x):
        def loss_fn(p):
            logits = policy.apply(p, x)
            key_s = jax.random.fold_in(key, 0)
            action = jax.random.categorical(key_s, logits)
            angle = interval_to_angle(action.astype(jnp.float32), policy.num_intervals)
            reward = jax.lax.stop_gradient(reward_fn(x, angle))
            logp = jax.nn.log_softmax(logits)[jnp.arange(x.shape[0]), action]
            advantage = reward - baseline
            return -jnp.mean(logp * advantage), (reward, action)

        (loss, (reward, action)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        baseline = baseline_decay * baseline + (1 - baseline_decay) * jnp.mean(reward)
        return params, opt_state, baseline, {"loss": loss, "mean_reward": jnp.mean(reward),
                                             "actions": action}

    return step
