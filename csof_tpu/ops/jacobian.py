"""Jacobian determinant of displacement fields (vectorized, on-device).

Capability parity with the reference's `jacobian_determinant`
(ref: nnunet/compute_jacobian.py:16-59): gradients of (disp + identity grid)
via `np.gradient` semantics (central differences, one-sided at borders),
then the 2D/3D determinant. Here it is jnp + vmap so whole (D, T) stacks of
flow fields evaluate in one XLA call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csof_tpu.ops.warp import identity_grid


def jacobian_determinant(disp: jnp.ndarray) -> jnp.ndarray:
    """disp: (*vol_shape, ndim) displacement -> (*vol_shape,) det J."""
    volshape = disp.shape[:-1]
    ndim = len(volshape)
    assert ndim in (2, 3), "flow must be 2D or 3D"
    phi = disp + identity_grid(volshape, disp.dtype)
    grads = [jnp.gradient(phi, axis=d) for d in range(ndim)]
    if ndim == 3:
        dx, dy, dz = grads
        det = (
            dx[..., 0] * (dy[..., 1] * dz[..., 2] - dy[..., 2] * dz[..., 1])
            - dx[..., 1] * (dy[..., 0] * dz[..., 2] - dy[..., 2] * dz[..., 0])
            + dx[..., 2] * (dy[..., 0] * dz[..., 1] - dy[..., 1] * dz[..., 0])
        )
    else:
        dfdx, dfdy = grads
        det = dfdx[..., 0] * dfdy[..., 1] - dfdy[..., 0] * dfdx[..., 1]
    return det


jacobian_determinant_batch = jax.vmap(jacobian_determinant)


def jacobian_stats(disp: jnp.ndarray, mask: jnp.ndarray | None = None):
    """|mean(J) - 1| and %negative-J, optionally within a structure mask
    (the per-structure aggregation of ref: compute_jacobian.py:62-227)."""
    det = jacobian_determinant(disp)
    if mask is None:
        mask = jnp.ones_like(det, dtype=bool)
    m = mask.astype(det.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean_j = jnp.sum(det * m) / n
    pct_neg = 100.0 * jnp.sum((det < 0) * m) / n
    return {"abs_mean_j_minus_1": jnp.abs(mean_j - 1.0), "pct_negative_j": pct_neg}
