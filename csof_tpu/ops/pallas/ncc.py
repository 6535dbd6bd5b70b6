"""Pallas kernel: fused windowed-NCC statistics.

The jnp reference (csof_tpu.ops.losses.ncc_loss) runs five separate
`reduce_window` sum-pools over (I, J, I^2, J^2, I*J). This kernel computes
all five local sums in one VMEM pass (separable box filter along y then x)
and emits the per-pixel cc map; the caller reduces to the scalar loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _box1d(x, window, axis):
    """Box-filter sum along `axis` via static shifted adds of the padded
    array (window is small and static)."""
    pad = window // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad, pad)
    xp = jnp.pad(x, pads)
    out = None
    for o in range(window):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(o, o + x.shape[axis])
        piece = xp[tuple(sl)]
        out = piece if out is None else out + piece
    return out


def _ncc_kernel(i_ref, j_ref, cc_ref, *, window: int, eps: float):
    i = i_ref[:]
    j = j_ref[:]
    stats = jnp.stack([i, j, i * i, j * j, i * j], axis=0)  # (5, H, W)
    s = _box1d(_box1d(stats, window, 1), window, 2)
    win = float(window * window)
    i_sum, j_sum, i2, j2, ij = s[0], s[1], s[2], s[3], s[4]
    i_mu, j_mu = i_sum / win, j_sum / win
    cross = ij - j_mu * i_sum - i_mu * j_sum + i_mu * j_mu * win
    i_var = i2 - 2 * i_mu * i_sum + i_mu * i_mu * win
    j_var = j2 - 2 * j_mu * j_sum + j_mu * j_mu * win
    cc_ref[:] = (cross * cross) / (i_var * j_var + eps)


def ncc_map_pallas(
    pred: jnp.ndarray, target: jnp.ndarray, window: int = 9, eps: float = 1e-3,
    interpret: bool = False,
) -> jnp.ndarray:
    """pred/target: (H, W) -> per-pixel cc map (H, W). Matches the interior
    semantics of ops.losses.ncc_loss (SAME zero padding at borders)."""
    kernel = functools.partial(_ncc_kernel, window=window, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(pred.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pred.astype(jnp.float32), target.astype(jnp.float32))


def ncc_loss_pallas(pred, target, window: int = 9, eps: float = 1e-3, interpret: bool = False):
    """1 - mean(cc) over (N, H, W, C) batches (same contract as
    ops.losses.ncc_loss, incl. the reference's cc clamp to [0.001, 0.999],
    ref: nnunet/lib/loss.py:68-70)."""
    n, h, w, c = pred.shape
    flat_p = pred.transpose(0, 3, 1, 2).reshape(n * c, h, w)
    flat_t = target.transpose(0, 3, 1, 2).reshape(n * c, h, w)
    cc = jax.vmap(lambda a, b: ncc_map_pallas(a, b, window, eps, interpret))(flat_p, flat_t)
    return 1.0 - jnp.mean(jnp.clip(cc, 0.001, 0.999))
