"""Plans-driven dynamic U-Net (the nnU-Net workhorse), TPU-native.

Capability parity with the reference's `Generic_UNet`
(ref: nnunet/network_architecture/generic_UNet.py:167-449), using the
nnUNetTrainerV2 recipe (ref: nnunet/training/network_training/
nnUNetTrainerV2.py:136-170): strided-conv pooling, transposed-conv
upsampling, InstanceNorm + LeakyReLU(0.01), no dropout, deep-supervision
1x1-conv heads at every decoder scale, features doubled per stage and capped
at 480 (2D) / 320 (3D).

Differences by design (TPU-first):
- channels-last (N, *spatial, C) so XLA maps convs onto the MXU,
- pure function of (params, x); deep supervision returns a tuple
  highest-resolution-first (same ordering the reference returns after its
  `seg_outputs[::-1]`),
- optional bf16 compute with fp32 params/norm statistics.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.config.plans import Plans, StagePlans
from csof_tpu.models.blocks import ConvNormAct, ConvTranspose, StackedConvs

MAX_FILTERS_2D = 480  # ref: generic_UNet.py:180
MAX_FILTERS_3D = 320  # ref: generic_UNet.py:173


class GenericUNet(nn.Module):
    num_classes: int
    base_num_features: int = 32
    # one per downsampling step; per-axis strides (ref plans pool_op_kernel_sizes)
    pool_kernel_sizes: Sequence[Sequence[int]] = ((2, 2), (2, 2), (2, 2), (2, 2), (2, 2))
    # one per resolution level = num_pool + 1 (ref plans conv_kernel_sizes)
    conv_kernel_sizes: Sequence[Sequence[int]] = ((3, 3),) * 6
    conv_per_stage: int = 2
    max_features: int | None = None
    norm: str = "instance"
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32
    #: rematerialize conv-stack activations in the backward pass. Required
    #: for 3d_fullres training geometry on one v5e: the stored-activation
    #: footprint of the (80,192,160)/batch-2 grad program is 62 GB vs
    #: 15.75 GB HBM (measured OOM, tools/bench_epoch.py); remat trades
    #: ~1/3 extra conv FLOPs for block-boundary-only activation storage.
    remat: bool = False
    #: with remat on, only rematerialize resolution levels < remat_levels
    #: (the high-res stages hold nearly all activation memory; storing the
    #: cheap deep stages avoids their recompute FLOPs). None = all levels.
    remat_levels: int | None = None
    #: remat policy: "full" re-executes the whole conv stack in the
    #: backward pass (max memory savings, ~2x the conv FLOPs);
    #: "save_conv" stores every conv output (bf16) and recomputes only the
    #: norm+activation epilogues — no conv ever runs twice, while the
    #: f32 norm temps that caused the 3d_fullres OOM are still
    #: rematerialized. At Task002 3d_fullres b=1 the saved conv outputs
    #: total ~4.5 GB incl. lane padding (fits the v5e's 15.75 GB).
    remat_policy: str = "full"

    def features_at(self, level: int) -> int:
        ndim = len(self.conv_kernel_sizes[0])
        cap = self.max_features or (MAX_FILTERS_3D if ndim == 3 else MAX_FILTERS_2D)
        return min(self.base_num_features * (2 ** level), cap)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        """x: (N, *spatial, C_in) -> logits (N, *spatial, num_classes) or a
        tuple of deep-supervision logits, full resolution first."""
        num_pool = len(self.pool_kernel_sizes)

        def stacked_for(level: int):
            on = self.remat and (
                self.remat_levels is None or level < self.remat_levels
            )
            if not on:
                return StackedConvs
            if self.remat_policy == "save_conv":
                import jax

                return nn.remat(
                    StackedConvs,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "conv_out"
                    ),
                )
            return nn.remat(StackedConvs)

        skips = []
        # encoder: levels 0..num_pool-1 at stride 1 relative to their input,
        # downsampling via the first conv of the *next* stage
        for d in range(num_pool):
            x = stacked_for(d)(
                self.features_at(d),
                self.conv_per_stage,
                self.conv_kernel_sizes[d],
                first_stride=None if d == 0 else self.pool_kernel_sizes[d - 1],
                norm=self.norm,
                dtype=self.dtype,
            )(x)
            skips.append(x)
        # bottleneck (ref: generic_UNet.py:290-305): downsample, then
        # conv_per_stage-1 convs at one feature level + 1 conv at next
        bottleneck_feats = self.features_at(num_pool)
        x = stacked_for(num_pool)(
            bottleneck_feats,
            self.conv_per_stage,
            self.conv_kernel_sizes[num_pool],
            first_stride=self.pool_kernel_sizes[-1],
            norm=self.norm,
            dtype=self.dtype,
        )(x)

        seg_outputs = []
        # decoder: upsample with transposed conv, concat skip, convs, 1x1 head
        for u in range(num_pool):
            level = num_pool - 1 - u
            skip = skips[level]
            # fast matmul+depth-to-space form of nn.ConvTranspose (exact;
            # see blocks.ConvTranspose) — named to keep the param path
            # identical to the flax auto-name so checkpoints transfer
            x = ConvTranspose(
                self.features_at(level),
                kernel_size=tuple(self.pool_kernel_sizes[level]),
                strides=tuple(self.pool_kernel_sizes[level]),
                padding="VALID",
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name=f"ConvTranspose_{u}",
            )(x)
            x = jnp.concatenate([x, skip], axis=-1)
            # decoder kernels: the reference indexes conv_kernel_sizes[-(u+1)]
            # (ref: generic_UNet.py:346), i.e. level L uses kernels[L+1] — for
            # anisotropic plans the full-res decoder stage uses the 3x3x3
            # kernel, NOT the (1,3,3) of encoder level 0
            x = stacked_for(level)(
                self.features_at(level),
                self.conv_per_stage,
                self.conv_kernel_sizes[level + 1],
                norm=self.norm,
                dtype=self.dtype,
            )(x)
            head = nn.Conv(
                self.num_classes,
                kernel_size=(1,) * (x.ndim - 2),
                use_bias=False,  # ref: seg_output_use_bias=False
                dtype=self.dtype,
                name=f"seg_head_{level}",
            )(x)
            seg_outputs.append(head.astype(jnp.float32))

        seg_outputs = seg_outputs[::-1]  # full resolution first
        if self.deep_supervision:
            return tuple(seg_outputs)
        return seg_outputs[0]


def unet_from_plans(
    plans: Plans,
    stage: int | None = None,
    deep_supervision: bool = True,
    dtype=jnp.float32,
    remat: bool | None = None,
    remat_policy: str | None = None,
) -> GenericUNet:
    """Build the network exactly as the plans prescribe
    (ref: nnUNetTrainerV2.initialize_network, nnUNetTrainerV2.py:136-170).

    remat=None auto-enables rematerialization for 3D plans: full-res 3D
    training patches OOM the v5e's 15.75 GB HBM without it (see
    GenericUNet.remat), while 2D geometries fit comfortably.  For those 3D
    plans the policy defaults to "save_conv" (store conv outputs, recompute
    only norm+act): measured 2x faster than full remat at Task002 3d_fullres
    (80.3 vs 161.7 s/epoch b1, tools/bench_epoch.py) at a memory cost that
    still fits. Param trees are identical either way (nn.remat is a lifted
    transform), so checkpoints transfer between settings."""
    sp: StagePlans = plans.stage(stage) if stage is not None else plans.fullres_stage()
    if remat is None:
        remat = len(sp.conv_kernel_sizes[0]) == 3
    if remat_policy is None:
        import os

        remat_policy = os.environ.get(
            "CSOF_REMAT_POLICY", "save_conv" if remat else "full"
        )
    return GenericUNet(
        num_classes=plans.num_classes_with_background,
        base_num_features=plans.base_num_features,
        pool_kernel_sizes=tuple(tuple(p) for p in sp.pool_op_kernel_sizes),
        conv_kernel_sizes=tuple(tuple(k) for k in sp.conv_kernel_sizes),
        conv_per_stage=plans.conv_per_stage,
        deep_supervision=deep_supervision,
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy,
    )
