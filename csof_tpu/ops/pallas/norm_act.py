"""Pallas kernel: fused InstanceNorm + LeakyReLU.

The U-Net's conv→norm→act chain spends several whole-tensor HBM passes on
the norm statistics and activation (XLA fuses imperfectly at large spatial
sizes). This kernel reads the activation ONCE per pass: grid over (N, C)
with the full (H, W) plane in VMEM — mean/var/normalize/affine/LeakyReLU in
a single VMEM-resident pass. Channel planes are independent, so the grid is
embarrassingly parallel.

Not yet wired as the default (kept for round-2 utilization work); numerics
validated against csof_tpu.models.blocks.InstanceNorm in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_act_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float, slope: float):
    x = x_ref[0, 0].astype(jnp.float32)  # (H, W) plane
    c = pl.program_id(1)
    mean = jnp.mean(x)
    var = jnp.mean(x * x) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[c] + bias_ref[c]
    o_ref[0, 0] = jnp.where(y >= 0, y, slope * y).astype(o_ref.dtype)


def instance_norm_leaky_relu_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    negative_slope: float = 0.01,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x: (N, H, W, C); scale/bias: (C,). Returns LeakyReLU(InstanceNorm(x)).

    Grid over (N, C); each program owns one (H, W) plane in VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    x_cm = jnp.moveaxis(x, -1, 1)  # (N, C, H, W) — plane-major
    scale2 = scale.reshape(c).astype(jnp.float32)
    bias2 = bias.reshape(c).astype(jnp.float32)
    kernel = functools.partial(_norm_act_kernel, eps=eps, slope=negative_slope)
    out = pl.pallas_call(
        kernel,
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), x.dtype),
        interpret=interpret,
    )(x_cm, scale2, bias2)
    return jnp.moveaxis(out, 1, -1)
