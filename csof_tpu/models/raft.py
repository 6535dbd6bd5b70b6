"""RAFT optical flow, TPU-native (BASELINE config 3).

Re-derived from the RAFT paper (Teed & Deng 2020, see PAPERS.md) — the
reference's own RAFT modules are missing from its tree and its trainer pins
the torchvision `raft_large` architecture instead
(ref: nnunet/training/network_training/nnMTLTrainerV2Raft.py:97,104; 12
iterations and sequence-loss gamma=0.8 per ref: nnunet/video.yaml
`raft_iters: 12` and nnMTLTrainerV2Raft.py:182).

TPU-first structure:
- all-pairs correlation = one batched matmul on the MXU
  (:func:`csof_tpu.ops.correlation.all_pairs_correlation`),
- the 12 GRU refinement iterations run under `lax.scan` (one compiled body),
- convex upsampling is an einsum over the 3x3 neighbourhood — no gather.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.config.experiment import RaftModelConfig
from csof_tpu.models.blocks import InstanceNorm
from csof_tpu.models.convgru import SepConvGRUCell
from csof_tpu.ops.correlation import (
    all_pairs_correlation,
    correlation_pyramid,
    lookup_correlation,
)
from csof_tpu.ops.warp import identity_grid


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride), padding="SAME", dtype=self.dtype)(x)
        y = nn.relu(InstanceNorm()(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = InstanceNorm()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride), dtype=self.dtype)(x)
            x = InstanceNorm()(x)
        return nn.relu(x + y)


class FeatureEncoder(nn.Module):
    """1/8-resolution feature extractor (RAFT 'large' shape)."""

    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(InstanceNorm()(x))
        for feats, stride in ((64, 1), (64, 1), (96, 2), (96, 1), (128, 2), (128, 1)):
            x = ResidualBlock(feats, stride, dtype=self.dtype)(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype)(x)


class MotionEncoder(nn.Module):
    """Encode (corr-lookup, current flow) into motion features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr, flow):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype)(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding="SAME", dtype=self.dtype)(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding="SAME", dtype=self.dtype)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(f))
        m = nn.relu(nn.Conv(126, (3, 3), padding="SAME", dtype=self.dtype)(jnp.concatenate([c, f], -1)))
        return jnp.concatenate([m, flow], axis=-1)  # 128 channels


class UpdateBlock(nn.Module):
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context, corr, flow):
        motion = MotionEncoder(dtype=self.dtype)(corr, flow)
        inp = jnp.concatenate([context, motion], axis=-1)
        hidden = SepConvGRUCell(self.hidden_dim, dtype=self.dtype)(hidden, inp)
        dflow = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype)(hidden)
        dflow = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype)(nn.relu(dflow))
        mask = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype)(hidden)
        mask = nn.Conv(64 * 9, (1, 1), dtype=self.dtype)(nn.relu(mask)) * 0.25
        return hidden, dflow.astype(jnp.float32), mask.astype(jnp.float32)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Upsample (h, w, 2) flow to (h*8, w*8, 2) with per-pixel convex
    combinations of the 3x3 coarse neighbourhood (RAFT Sec. 3.3)."""
    h, w, _ = flow.shape
    m = mask.reshape(h, w, 9, factor, factor)
    m = jax.nn.softmax(m, axis=2)
    # 3x3 neighbourhood of the (scaled) coarse flow
    fpad = jnp.pad(flow * factor, ((1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fpad[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)], axis=2
    )  # (h, w, 9, 2)
    up = jnp.einsum("hwkuv,hwkc->hwuvc", m, neigh)
    return up.transpose(0, 2, 1, 3, 4).reshape(h * factor, w * factor, 2)


class RAFT(nn.Module):
    """Full RAFT: returns all iteration flow fields (iters, H, W, 2),
    full-resolution first axis ordered by iteration."""

    config: RaftModelConfig = RaftModelConfig()

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray, iters: int | None = None):
        """image1/2: (H, W, C) with H, W divisible by 8."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        iters = iters or cfg.iters
        fmap1 = FeatureEncoder(cfg.feature_dim, dtype=dtype)(image1[None])[0]
        fmap2 = FeatureEncoder(cfg.feature_dim, dtype=dtype)(image2[None])[0]
        ctx = FeatureEncoder(cfg.hidden_dim + cfg.context_dim, dtype=dtype, name="context_encoder")(
            image1[None]
        )[0]
        hidden = nn.tanh(ctx[..., : cfg.hidden_dim])
        context = nn.relu(ctx[..., cfg.hidden_dim :])

        corr = all_pairs_correlation(fmap1.astype(jnp.float32), fmap2.astype(jnp.float32))
        pyramid = correlation_pyramid(corr, cfg.corr_levels)

        h8, w8 = fmap1.shape[:2]
        coords0 = identity_grid((h8, w8))

        # nn.scan compiles ONE update-block body and iterates it `iters`
        # times with shared params (the reference loops in Python per
        # iteration; ref: raft recipe, nnMTLTrainerV2Raft.py:182)
        scan = nn.scan(
            _RaftUpdateStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=iters,
            # serving lever (cfg.scan_unroll): the update block's ops at
            # 1/8-res geometry all sit below the per-kernel dispatch floor,
            # so the rolled loop pays ~12x the floor; unrolling lets XLA
            # fuse across iterations. Params identical for any value.
            unroll=min(cfg.scan_unroll, iters),
        )(hidden_dim=cfg.hidden_dim, corr_radius=cfg.corr_radius, dtype=dtype)
        init = (hidden, jnp.zeros((h8, w8, 2), jnp.float32))
        _, flows_up = scan(init, tuple(pyramid), context, coords0, None)
        return flows_up  # (iters, H, W, 2)


class _RaftUpdateStep(nn.Module):
    hidden_dim: int
    corr_radius: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, pyramid, context, coords0, _):
        hidden, flow = carry
        coords = coords0 + flow
        corr_feat = lookup_correlation(list(pyramid), coords, self.corr_radius)
        hidden, dflow, mask = UpdateBlock(self.hidden_dim, dtype=self.dtype)(
            hidden, context, corr_feat.astype(self.dtype), flow.astype(self.dtype)
        )
        flow = flow + dflow
        up = convex_upsample(flow, mask)
        return (hidden, flow), up
