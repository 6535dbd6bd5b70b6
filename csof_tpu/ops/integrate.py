"""Diffeomorphic integration by scaling-and-squaring.

Capability parity with the reference's `VecInt`
(ref: nnunet/network_architecture/integration.py:84-98): a stationary
velocity field is integrated by dividing by 2^n and self-composing n times
(default n=7). Expressed as a `lax.fori_loop` of warps so XLA compiles one
fused loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csof_tpu.ops.warp import warp_image


def vecint(velocity: jnp.ndarray, num_steps: int = 7) -> jnp.ndarray:
    """velocity: (*spatial, ndim) stationary velocity field -> displacement.

    flow_0 = v / 2^n;  flow_{k+1} = flow_k + warp(flow_k, flow_k).
    """
    flow0 = velocity / (2.0**num_steps)

    def body(_, flow):
        return flow + warp_image(flow, flow, mode="bilinear", padding="border")

    return jax.lax.fori_loop(0, num_steps, body, flow0)


def vecint_batch(velocity: jnp.ndarray, num_steps: int = 7) -> jnp.ndarray:
    """vmap over a leading batch axis: (N, *spatial, ndim)."""
    return jax.vmap(lambda v: vecint(v, num_steps))(velocity)
