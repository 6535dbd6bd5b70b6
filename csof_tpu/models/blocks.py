"""Shared conv/norm/attention building blocks (flax.linen, channels-last).

TPU-first re-design of the reference's block library
(ref: nnunet/network_architecture/generic_UNet.py:26-79 `ConvDropoutNormNonlin`;
ref: nnunet/lib/encoder.py / lib/utils.py conv blocks): channels-last layouts
so XLA tiles convs onto the MXU, fused norm+activation, bf16-friendly.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims
    (ref norm: nn.InstanceNorm{2,3}d(affine=True, eps=1e-5)).

    `fused_leaky_relu=True` routes through the Pallas
    instance_norm_leaky_relu kernel using the SAME scale/bias params, so the
    param tree (and checkpoints) are identical whether fusion is enabled or
    not."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    fused_leaky_relu: bool = False
    #: >1 = channels are space-to-depth packed BLOCK-MAJOR (ops/s2d_conv.py:
    #: packed channel = block*C + c, packed_blocks spatial phases per
    #: logical channel). Statistics then reduce over spatial dims AND the
    #: phase blocks — per LOGICAL channel, exactly what the unpacked norm
    #: computes — and the (C,) scale/bias params are unchanged, so
    #: checkpoints transfer between packed and unpacked stages.
    packed_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (N, *spatial, C); statistics in fp32 even for bf16 activations
        c = x.shape[-1] // self.packed_blocks
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.fused_leaky_relu:
            from csof_tpu.ops.pallas.norm_act import instance_norm_leaky_relu_pallas

            return instance_norm_leaky_relu_pallas(x, scale, bias)
        if self.packed_blocks > 1:
            return self._packed(x, scale, bias)
        axes = tuple(range(1, x.ndim - 1))
        if x.dtype == jnp.bfloat16:
            # bf16 fast path: f32 ACCUMULATION without f32 MATERIALIZATION.
            # The previous x.astype(f32) pipeline made XLA materialize
            # full-resolution f32 temps around every norm — at 3d_fullres
            # geometry those were the six largest allocations of the train
            # step (1.85 GB each incl. the 4x lane-padding, OOM dump in
            # docs/BENCHMARKS.md). One-pass E[x^2]-E[x]^2 with dtype=f32
            # reductions keeps every materialized tensor bf16; the affine is
            # folded to a single fused multiply-add in bf16 (same final
            # precision — the old path rounded its f32 result to bf16 too).
            # Flat (N, C) stats + affine coeffs (no keepdims/tile chains):
            # the per-norm tiny-kernel count is the serving bottleneck on
            # this backend (~50-90 us per dispatched kernel, docs round 4).
            # NB measured: a variadic lax.reduce over (xf, xf*xf) does NOT
            # fuse its f32 converts on this backend (1572 -> 1347 f/s);
            # two jnp.mean(dtype=f32) reduces keep the fast lowering.
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)  # (N, C)
            m2 = jnp.mean(jnp.square(x), axis=axes, dtype=jnp.float32)
            inv = jax.lax.rsqrt(jnp.maximum(m2 - mean * mean, 0.0) + self.eps)
            a = scale * inv  # (N, C) f32, tiny
            b = bias - mean * a
            bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            return x * a.astype(x.dtype).reshape(bshape) + b.astype(x.dtype).reshape(bshape)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)

    def _packed(self, x, scale, bias):
        """InstanceNorm on a space-to-depth packed tensor: per-LOGICAL-channel
        stats over (spatial, phase blocks); same flat-stat formulation and
        bf16 discipline as the unpacked fast path above."""
        blocks = self.packed_blocks
        n = x.shape[0]
        c = x.shape[-1] // blocks
        sp_axes = tuple(range(1, x.ndim - 1))
        # flat (N, blocks*C) spatial sums, then combine blocks on the tiny
        # stat tensor (same rationale as GroupNorm's fast path below)
        s1 = jnp.mean(x, axis=sp_axes, dtype=jnp.float32)
        s2 = jnp.mean(jnp.square(x), axis=sp_axes, dtype=jnp.float32)
        mean = jnp.mean(s1.reshape(n, blocks, c), axis=1)  # (N, C)
        m2 = jnp.mean(s2.reshape(n, blocks, c), axis=1)
        inv = jax.lax.rsqrt(jnp.maximum(m2 - mean * mean, 0.0) + self.eps)
        a = scale * inv  # (N, C)
        b = bias - mean * a
        # block-major packed channels: tiling the (N, C) coeffs `blocks`
        # times lands coefficient c at every packed index block*C + c
        a4 = jnp.tile(a, (1, blocks)).astype(x.dtype)
        b4 = jnp.tile(b, (1, blocks)).astype(x.dtype)
        bshape = (n,) + (1,) * (x.ndim - 2) + (blocks * c,)
        return x * a4.reshape(bshape) + b4.reshape(bshape)


class GroupNorm(nn.Module):
    """GroupNorm (ref: lib encoder blocks use group norm, video.yaml norm: group)."""

    num_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = min(self.num_groups, c)
        while c % g:
            g -= 1
        orig_shape = x.shape
        spatial = x.shape[1:-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if x.dtype == jnp.bfloat16:
            # bf16 fast path: f32 accumulation without f32 materialization
            # (same rationale + measurements as InstanceNorm above). Affine
            # coeffs computed flat at (N, g, c/g) — the old keepdims +
            # jnp.tile chain emitted ~8 tiny copies/reduces per norm, the
            # dominant kernel count of the SegFlow serving step (768 copies
            # + 384 reduces of 256-byte stat tensors in the optimized HLO;
            # docs/BENCHMARKS.md round 4).
            cpg = c // g
            # reduce over SPATIAL axes only, keeping C on the lane axis —
            # reshaping the full tensor to (..., g, c/g) first puts c/g(=4)
            # on lanes, which forces a layout-changing copy of the whole
            # activation + a lane-4 VPU reduce (measured 1572 -> 906 f/s on
            # the serving bench). The group combine then runs on the TINY
            # (N, C) sums instead.
            sp_axes = tuple(range(1, x.ndim - 1))
            s1c = jnp.mean(x, axis=sp_axes, dtype=jnp.float32)  # (N, C)
            s2c = jnp.mean(jnp.square(x), axis=sp_axes, dtype=jnp.float32)
            mean = jnp.mean(s1c.reshape(x.shape[0], g, cpg), axis=-1)  # (N, g)
            m2 = jnp.mean(s2c.reshape(x.shape[0], g, cpg), axis=-1)
            inv = jax.lax.rsqrt(jnp.maximum(m2 - mean * mean, 0.0) + self.eps)
            # per-channel affine: scale/bias (g, c/g) x per-group stats
            a = scale.reshape(g, cpg) * inv[:, :, None]  # (N, g, c/g) f32
            b = bias.reshape(g, cpg) - mean[:, :, None] * a
            bshape = (x.shape[0],) + (1,) * len(spatial) + (c,)
            return x * a.astype(x.dtype).reshape(bshape) + b.astype(x.dtype).reshape(bshape)
        xg = x.astype(jnp.float32).reshape(x.shape[0], *spatial, g, c // g)
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(orig_shape)
        return (y * scale + bias).astype(x.dtype)


def make_norm(kind: str, **kw):
    if kind == "none":  # diagnostic ablations (tools/bench_epoch2d.py)
        return lambda x: x
    if kind == "instance":
        return InstanceNorm()
    if kind == "group":
        return GroupNorm(num_groups=kw.get("num_groups", 8))
    if kind == "layer":
        return nn.LayerNorm()
    if kind == "batch":
        # stateless batch norm is a poor fit for pure train steps; GroupNorm is
        # the TPU-friendly stand-in (same role in the reference's configs)
        return GroupNorm(num_groups=kw.get("num_groups", 8))
    raise ValueError(f"unknown norm kind {kind!r}")


class Conv3dVia2D(nn.Module):
    """3D convolution computed as kz z-shifted batched 2D convolutions.

    Mathematically EXACT (y[z] = sum_dz conv2d(x[z*sz+dz-pad], W[dz])) with
    identical FLOPs — but measured 3-7.5x faster than XLA's native 3D conv
    lowering on the TPU backend (tools/bench_conv3d.py, honest fetch-sync
    timing: the (1,3,3)-kernel conv at Task002 3d_fullres geometry runs at
    26.8/29.0 TF/s fwd/grad as a 2D conv vs 8.9/3.9 as a kz=1 3D conv; the
    z axis folds into the conv batch, B*D=80-160 images per call). Param
    name ("kernel"/"bias") and shape ((kz,ky,kx,ci,co)) are IDENTICAL to
    nn.Conv, so checkpoints transfer both ways.
    """

    features: int
    kernel_size: Sequence[int]  # (kz, ky, kx)
    strides: Sequence[int] | None = None
    padding: Sequence[tuple] | None = None  # per-axis (lo, hi); None = odd-SAME
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    #: input/output are space-to-depth packed in (H, W) — (N, D, H/2, W/2,
    #: 4C) block-major (ops/s2d_conv.py). Requires ky=kx=3, sy=sx=1, SAME
    #: padding; the z axis is handled by the usual tap loop. The parameter
    #: stays the LOGICAL (kz,3,3,ci,co) kernel (packed at trace time), so
    #: checkpoints transfer between packed and unpacked stages.
    packed_io: bool = False

    @nn.compact
    def __call__(self, x):
        kz, ky, kx = self.kernel_size
        sz, sy, sx = tuple(self.strides) if self.strides else (1, 1, 1)
        pads = (
            [((k - 1) // 2, k // 2) for k in self.kernel_size]
            if self.padding is None
            else [tuple(p) for p in self.padding]
        )
        if self.packed_io:
            assert (ky, kx) == (3, 3) and (sy, sx) == (1, 1), (
                "packed_io requires a stride-1 3x3 spatial kernel"
            )
            assert pads[1] == (1, 1) and pads[2] == (1, 1), pads
        ci = x.shape[-1] // (4 if self.packed_io else 1)
        w = self.param(
            "kernel", self.kernel_init, (kz, ky, kx, ci, self.features), jnp.float32
        )
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        n, d, h, wd, _ = x.shape
        if pads[0] != (0, 0):
            x = jnp.pad(x, ((0, 0), pads[0], (0, 0), (0, 0), (0, 0)))
        d_pad = x.shape[1]
        d_out = (d_pad - kz) // sz + 1
        # Accumulate the cross-dz partial sums in f32 when computing in a
        # low-precision dtype: the MXU accumulates each conv in f32 anyway,
        # so rounding each yz to bf16 BEFORE the sum would add kz-1 extra
        # bf16 roundings versus a native 3D conv's single wide accumulation
        # (round-3 ADVICE). kz==1 has no cross-dz sum, so no upcast needed.
        acc_t = jnp.float32 if (kz > 1 and self.dtype != jnp.float32) else self.dtype
        # narrow-Cout inner convs can run lane-full in the tap-sum form
        # (ops/tapsum_conv.py) — the 3D-fullres C=32 plateau breaker
        tapsum = (
            not self.packed_io
            and (sy, sx) == (1, 1)
            and _conv2d_tapsum_enabled((ky, kx), ci, self.features)
        )
        # ... or in the Pallas cols kernel (ops/pallas/conv.py): the
        # tap-widened matmul with the column adds done IN VMEM — no HBM
        # round trip for the widened intermediate (CSOF_CONV2D_IMPL=pallas)
        pallas_cols = (
            not tapsum
            and not self.packed_io
            and pads[1] == ((ky - 1) // 2, ky // 2)
            and pads[2] == ((kx - 1) // 2, kx // 2)
            and _conv2d_pallas_enabled((ky, kx), (sy, sx), ci, self.features, wd)
        )
        y = None
        for dz in range(kz):
            xs = jax.lax.slice_in_dim(x, dz, dz + (d_out - 1) * sz + 1, 1, axis=1)
            if sz > 1:
                xs = xs[:, ::sz]
            xs = xs.reshape(n * d_out, h, wd, xs.shape[-1])
            if self.packed_io:
                from csof_tpu.ops.s2d_conv import conv2d_s2d_packed

                # packed k=2 conv: full 128-lane contraction AND output
                # tiles for the C=32 stages (the 1.8x-under-grad winner of
                # the round-5 s2d decision probes, docs/BENCHMARKS.md)
                yz = conv2d_s2d_packed(xs, w[dz], acc_t == jnp.float32)
            elif pallas_cols:
                from csof_tpu.ops.pallas.conv import conv3x3_cols_vb

                # interpret mode off-TPU so CPU tests exercise the same path
                yz = conv3x3_cols_vb(
                    xs, w[dz], jax.default_backend() != "tpu",
                    acc_t == jnp.float32,
                )
            elif tapsum:
                from csof_tpu.ops.tapsum_conv import conv2d_tapsum

                yz = conv2d_tapsum(
                    xs, w[dz], padding=[pads[1], pads[2]], out_dtype=acc_t
                )
            elif acc_t != self.dtype:
                # wide-accum conv with a low-precision-safe gradient (the
                # raw preferred_element_type=f32 conv has no valid
                # transpose rule on bf16 inputs)
                from csof_tpu.ops.tapsum_conv import conv2d_f32acc

                yz = conv2d_f32acc(
                    xs, w[dz], (sy, sx), (tuple(pads[1]), tuple(pads[2]))
                )
            else:
                yz = jax.lax.conv_general_dilated(
                    xs, w[dz], (sy, sx), [pads[1], pads[2]],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_t,
                )
            y = yz if y is None else y + yz
        y = y.astype(self.dtype).reshape(n, d_out, *y.shape[1:])
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.packed_io:
                # block-major packed channels: repeat the logical bias once
                # per phase block (packed index = block*co + o)
                bias = jnp.tile(bias, 4)
            y = y + bias.astype(self.dtype)
        return y


def _conv3d_via_2d_enabled() -> bool:
    import os

    return os.environ.get("CSOF_CONV3D_IMPL", "2d") == "2d"


def _unet_s2d_enabled() -> bool:
    import os

    return os.environ.get("CSOF_UNET_S2D", "0") == "1"


def _conv2d_tapsum_enabled(kernel_size, ci: int, co: int) -> bool:
    from csof_tpu.ops.tapsum_conv import conv2d_impl, tapsum_worthwhile

    kh, kw = kernel_size
    return conv2d_impl() == "tapsum" and tapsum_worthwhile(kh, kw, ci, co)


def _conv2d_pallas_enabled(kernel_size, strides, ci: int, co: int,
                           w: int | None = None) -> bool:
    from csof_tpu.ops.pallas.conv import conv3x3_cols_worthwhile
    from csof_tpu.ops.tapsum_conv import conv2d_impl

    return conv2d_impl() == "pallas" and conv3x3_cols_worthwhile(
        kernel_size, strides, ci, co, w
    )


class TapsumConv(nn.Module):
    """Stride-1 2D conv computed in the tap-sum form (ops/tapsum_conv.py):
    one matmul with Kh*Kw*Co output lanes + fused shifted adds, instead of
    XLA's Co-lane implicit matmul — full MXU occupancy for the narrow-Cout
    stages. Param names ("kernel"/"bias") and shapes are IDENTICAL to
    nn.Conv, so checkpoints transfer between impls."""

    features: int
    kernel_size: Sequence[int]
    padding: Sequence[tuple] | None = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from csof_tpu.ops.tapsum_conv import conv2d_tapsum

        kh, kw = self.kernel_size
        w = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features), jnp.float32
        )
        b = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        pads = [tuple(p) for p in self.padding] if self.padding is not None else None
        return conv2d_tapsum(
            x.astype(self.dtype),
            w.astype(self.dtype),
            None if b is None else b.astype(self.dtype),
            padding=pads,
        )


class PallasConv(nn.Module):
    """Stride-1 3x3 SAME conv via the Pallas cols kernel
    (ops/pallas/conv.py): H-im2col matmul with tap-widened output lanes +
    in-VMEM column adds. Param names ("kernel"/"bias") and shapes are
    IDENTICAL to nn.Conv, so checkpoints transfer between impls."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from csof_tpu.ops.pallas.conv import conv3x3_cols_vb

        w = self.param(
            "kernel", self.kernel_init, (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        unbatched = x.ndim == 3
        if unbatched:
            x = x[None]
        y = conv3x3_cols_vb(
            x.astype(self.dtype), w.astype(self.dtype),
            jax.default_backend() != "tpu",
        )
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y[0] if unbatched else y


class ConvNormAct(nn.Module):
    """conv -> norm -> activation (ref: ConvDropoutNormNonlin,
    generic_UNet.py:26-69; dropout p=0 in the V2 recipe so omitted)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    norm: str = "instance"
    act: Callable = leaky_relu
    dtype: jnp.dtype = jnp.float32
    #: space-to-depth packed input/output (set by StackedConvs when the
    #: whole stage runs packed; 3D via-2D convs + instance norm only)
    packed_io: bool = False

    @nn.compact
    def __call__(self, x):
        # explicit padding: odd kernels get (k//2, k//2) — identical to SAME
        # at stride 1 and to torch's padding=k//2 at stride 2 (XLA SAME pads
        # (0,1) there, which would break reference-checkpoint parity); even
        # kernels get (k//2-1, k//2) which preserves SAME sizing
        pad = [
            ((k - 1) // 2, k // 2)
            for k in self.kernel_size
        ]
        if self.packed_io:
            assert len(self.kernel_size) == 3 and _conv3d_via_2d_enabled()
            assert self.strides is None or tuple(self.strides) == (1, 1, 1)
            assert self.norm == "instance"
            x = Conv3dVia2D(
                self.features,
                kernel_size=tuple(self.kernel_size),
                padding=pad,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                packed_io=True,
                name="Conv_0",
            )(x)
            from jax.ad_checkpoint import checkpoint_name

            x = checkpoint_name(x, "conv_out")
            x = InstanceNorm(packed_blocks=4, name="InstanceNorm_0")(x)
            return self.act(x)
        if len(self.kernel_size) == 3 and _conv3d_via_2d_enabled():
            # 3D convs recast as z-shifted batched 2D convs (see
            # Conv3dVia2D): exact same math/params, 3-7.5x faster on TPU.
            # name="Conv_0" keeps the param path identical to the nn.Conv
            # branch so checkpoints transfer regardless of the env flag.
            x = Conv3dVia2D(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(self.strides) if self.strides else None,
                padding=pad,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name="Conv_0",
            )(x)
        elif (
            len(self.kernel_size) == 2
            and (self.strides is None or tuple(self.strides) == (1, 1))
            and _conv2d_pallas_enabled(
                self.kernel_size, (1, 1), x.shape[-1], self.features, x.shape[-2]
            )
        ):
            # Pallas cols kernel (see PallasConv); param path pinned to
            # "Conv_0" kernel/bias so checkpoints transfer either way
            x = PallasConv(
                self.features,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name="Conv_0",
            )(x)
        elif (
            len(self.kernel_size) == 2
            and (self.strides is None or tuple(self.strides) == (1, 1))
            and _conv2d_tapsum_enabled(self.kernel_size, x.shape[-1], self.features)
        ):
            # tap-sum form: the KxK taps ride the matmul OUTPUT dim so a
            # narrow-Cout conv still fills the 128 MXU lanes (see
            # ops/tapsum_conv.py). Param path/shape identical to nn.Conv
            # ("Conv_0" kernel/bias) so checkpoints transfer either way.
            x = TapsumConv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                padding=pad,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(self.strides) if self.strides else None,
                padding=pad,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
            )(x)
        # named checkpoint anchor for the selective-remat policy
        # (GenericUNet remat_policy="save_conv"): under
        # save_only_these_names, conv outputs are STORED for the backward
        # pass while the cheap norm+activation epilogue is recomputed —
        # no conv ever runs twice, unlike full remat (which re-executes
        # the whole stack forward, ~2x the conv FLOPs of the step).
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "conv_out")
        # fused Pallas InstanceNorm+LeakyReLU epilogue (see
        # ops/pallas/norm_act.py). Env-gated, 2D-inference only (no custom
        # VJP yet). The fused path consumes the SAME InstanceNorm_0
        # scale/bias params, so checkpoints restore regardless of the flag.
        import os

        if (
            self.norm == "instance"
            and self.act is leaky_relu
            and x.ndim == 4
            and os.environ.get("CSOF_FUSED_NORM", "0") == "1"
        ):
            return InstanceNorm(fused_leaky_relu=True, name="InstanceNorm_0")(x)
        x = make_norm(self.norm)(x)
        return self.act(x)


class StackedConvs(nn.Module):
    """`num_convs` ConvNormAct blocks; the first may downsample via stride
    (ref: StackedConvLayers, generic_UNet.py:79-141 with
    convolutional_pooling=True)."""

    features: int
    num_convs: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int] | None = None
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Space-to-depth packed stage (CSOF_UNET_S2D=1): the narrow-channel
        # full-res 3D stages run their whole conv stack on the (H/2, W/2,
        # 4C) packed grid — the stride-1 3x3 C=32 via-2D conv is MXU-tile
        # bound at 29 TF/s unpacked vs 52 useful packed under grad (round-5
        # decision probes, docs/BENCHMARKS.md). Pack/unpack cost is paid
        # once per stage, not per conv; params are identical either way.
        s2d = (
            _unet_s2d_enabled()
            and len(self.kernel_size) == 3
            and tuple(self.kernel_size[1:]) == (3, 3)
            and self.first_stride is None
            and self.features <= 48
            and self.norm == "instance"
            and x.shape[-3] % 2 == 0
            and x.shape[-2] % 2 == 0
            and _conv3d_via_2d_enabled()
        )
        if s2d:
            from csof_tpu.ops.s2d_conv import depth_to_space, space_to_depth

            x = space_to_depth(x)
        for i in range(self.num_convs):
            x = ConvNormAct(
                self.features,
                self.kernel_size,
                strides=self.first_stride if i == 0 else None,
                norm=self.norm,
                dtype=self.dtype,
                packed_io=s2d,
            )(x)
        if s2d:
            x = depth_to_space(x)
        return x


class ConvTranspose(nn.Module):
    """Drop-in for flax `nn.ConvTranspose` in the kernel_size == strides,
    padding=VALID case (the only one U-Net decoders use): computed as a
    1x1-style matmul producing `prod(kernel) * features` channels followed
    by a depth-to-space interleave.

    Rationale (TPU): XLA lowers transposed convs via input dilation — the
    2x2(x2) kernel then slides over a zero-dilated input, wasting
    prod(kernel)x the useful MACs on zeros, with C_out=32 lanes. The matmul
    form does exactly the useful FLOPs with prod(kernel)*C_out (>=128)
    output lanes. Param name/shape/meaning are IDENTICAL to
    nn.ConvTranspose ("kernel" (*k, C_in, C_out) + "bias"), so checkpoints
    transfer both ways; tests/test_blocks.py pins exact output parity."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: str = "VALID"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        assert tuple(self.strides) == k and self.padding == "VALID", (
            "fast ConvTranspose only implements kernel_size == strides, VALID"
        )
        ci = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (*k, ci, self.features), jnp.float32)
        nd = len(k)
        prod_k = 1
        for f in k:
            prod_k *= f
        # flax's conv_transpose(transpose_kernel=False) scatters x[q]*w into
        # y[s*q + r] at MIRRORED kernel offset: output position s*q + r
        # reads kernel index (k-1-r) per axis (verified numerically vs
        # nn.ConvTranspose; consistent with compat/torch_import.py:_tconv_w
        # mirroring torch weights for flax).
        w = w[(slice(None, None, -1),) * nd]
        wf = w.reshape(prod_k, ci, self.features).astype(self.dtype)
        y = jnp.einsum("...i,pio->...po", x.astype(self.dtype), wf)
        # (N, *S, prod_k, C) -> (N, *S, *k, C) -> interleave each spatial
        # axis with its kernel axis -> (N, *(S*k), C)
        n = x.shape[0]
        spatial = x.shape[1:-1]
        y = y.reshape(n, *spatial, *k, self.features)
        perm = [0]
        for ax in range(nd):
            perm.extend([1 + ax, 1 + nd + ax])
        perm.append(1 + 2 * nd)
        y = y.transpose(*perm)
        y = y.reshape(n, *[s * f for s, f in zip(spatial, k)], self.features)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def upsample_nearest(x: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbor upsampling of spatial dims (channels-last)."""
    for ax, f in enumerate(factors):
        if f != 1:
            x = jnp.repeat(x, f, axis=ax + 1)
    return x


def upsample_linear(x: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    """Bi/tri-linear upsampling via jax.image.resize (align_corners=False
    semantics, matching torch nn.Upsample(mode='bilinear'))."""
    new_shape = (
        x.shape[0],
        *[s * f for s, f in zip(x.shape[1:-1], factors)],
        x.shape[-1],
    )
    return jax.image.resize(x, new_shape, method="linear")
