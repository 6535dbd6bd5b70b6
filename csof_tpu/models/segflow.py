"""SegFlow: joint segmentation + optical-flow cardiac video model (flagship,
BASELINE config 5).

Capability parity with the reference's `SegFlowGaussian`
(ref: nnunet/network_architecture/SegFlowGaussian.py:70-378 module graph;
canonical forward `forward_multi_task_flow_deformable_cost_volume_
transformer_cat` at ref: SegFlowGaussian.py:1330-1445):

- dual encoders: a `query_encoder` on the current frame (ref :242) and a
  `memory_encoder` over the 6-channel past state
  [x0, x_prev, cumulative-flow(2), error, registered] (ref :231, 1343),
- per-scale local correlation volumes fused with memory skips
  (ref :255-269, 1374-1386),
- two cross-attention bottlenecks: current-vs-previous matching and
  current-vs-ED(first)+past-motion (ref :356-357, 1395-1407),
- ConvGRU hidden state across frames (ref :342-350, 1415),
- flow decoder (2 channels) + cumulative backward-flow integration with
  warping and error feedback (ref :296, 1419-1428),
- a segmentation decoder on query features (joint seg+flow multi-task).

TPU-first re-design: the per-frame Python loop becomes `nn.scan` over the
time axis (carry = GRU hidden + cumulative flow + prev bottleneck), all
frame-independent encoding is batched over T, correlation volumes are
shift-product ops (no gather), and compute runs in bf16 with fp32 heads.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.models.attention import CrossAttentionLayer
from csof_tpu.models.blocks import (
    ConvNormAct,
    ConvTranspose,
    leaky_relu,
    make_norm,
    upsample_linear,
)
from csof_tpu.models.convgru import ConvGRUCell
from csof_tpu.ops.correlation import local_correlation_volume
from csof_tpu.ops.warp import warp_image_cm


class Encoder(nn.Module):
    """Conv encoder returning per-level skips (last = bottleneck input).
    (ref: nnunet/lib/encoder.py:515 Encoder2D — conv stages + group norm)."""

    out_dims: Sequence[int]
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, f in enumerate(self.out_dims):
            stride = (2, 2) if i > 0 else (1, 1)
            x = ConvNormAct(f, (3, 3), strides=stride, norm=self.norm, dtype=self.dtype)(x)
            x = ConvNormAct(f, (3, 3), norm=self.norm, dtype=self.dtype)(x)
            skips.append(x)
        return skips


class Decoder(nn.Module):
    """Upsample + skip-fusion decoder with a linear head
    (ref: nnunet/lib/decoder_alt.py:781 Decoder2D).

    With `deep_supervision` on, each intermediate decoder stage also emits a
    full-resolution auxiliary head (the reference upsamples per-stage DS
    heads straight to full res with a stride-2^k transposed conv,
    ref: decoder_alt.py:852-856; here: 1x1 conv + bilinear upsample). The DS
    params only exist when the flag is on, so checkpoints trained without it
    are unaffected."""

    out_dims: Sequence[int]  # high-to-low resolution feature dims
    head_channels: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    head_init_scale: float = 1.0
    deep_supervision: bool = False
    #: "expand" = the reference's PatchExpand upsample — ConvTranspose(2,2)
    #: + GroupNorm + GELU (ref: nnunet/lib/utils.py:1982 PatchExpand2DGroup)
    #: computed in the fast matmul+depth-to-space form (blocks.ConvTranspose,
    #: prod(k)*C output lanes on the MXU). "linear" = bilinear resize +
    #: concat (round-2 shape; kept for old checkpoints).
    upsample: str = "expand"

    @nn.compact
    def __call__(self, bottleneck, skips):
        # accepts unbatched (H, W, C) or batched (N, H, W, C) inputs — the
        # batched path lets SegFlow run the seg decoder once over all T
        # frames (GroupNorm is per-sample, so this is math-identical)
        unbatched = bottleneck.ndim == 3
        if unbatched:
            bottleneck = bottleneck[None]
            skips = [s[None] for s in skips]
        x = bottleneck
        ds_heads = []
        n_up = len(skips) - 1
        for i, skip in enumerate(reversed(skips[:-1])):
            f = self.out_dims[len(skips) - 2 - i]
            if self.upsample == "expand":
                x = ConvTranspose(
                    f, (2, 2), (2, 2), dtype=self.dtype, name=f"expand_{i}"
                )(x)
                x = nn.gelu(make_norm(self.norm)(x))
            else:
                x = upsample_linear(x, (2, 2))
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvNormAct(f, (3, 3), norm=self.norm, dtype=self.dtype)(x)
            x = ConvNormAct(f, (3, 3), norm=self.norm, dtype=self.dtype)(x)
            if self.deep_supervision and i < n_up - 1:
                ds = nn.Conv(
                    self.head_channels, (1, 1), dtype=jnp.float32,
                    name=f"ds_head_{i}",
                )(x.astype(jnp.float32))
                factor = 2 ** (n_up - 1 - i)
                ds_heads.append(upsample_linear(ds, (factor, factor)))
        head = nn.Conv(
            self.head_channels,
            (1, 1),
            kernel_init=nn.initializers.normal(1e-5 * self.head_init_scale),
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        if unbatched:
            head, x = head[0], x[0]
            ds_heads = [d[0] for d in ds_heads]
        if self.deep_supervision:
            # finest-first list, matching the reference's reversed
            # output_list (ref: decoder_alt.py:775)
            return (head, *reversed(ds_heads)), x
        return head, x


class _NCHWConv(nn.Module):
    """3x3 SAME conv consuming a CHANNEL-MAJOR (N, C, H, W) input and
    emitting channels-last (N, H, W, F). Param path/shape identical to an
    nn.Conv of the same name ((3, 3, C_in, F) "kernel"), so checkpoints
    transfer between the layouts. Used by SkipFuse split mode to eat the
    corr kernel's native channel-major output without transpose glue."""

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x_cm):
        ci = x_cm.shape[1]
        w = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, ci, self.features),
            jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x_cm.astype(self.dtype), w.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class _NCHWConvNormAct(nn.Module):
    """ConvNormAct consuming a CHANNEL-MAJOR input (param paths identical:
    Conv_0 kernel/bias + the same auto-named norm, so checkpoints transfer
    between this and the channels-last ConvNormAct)."""

    features: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_cm):
        from jax.ad_checkpoint import checkpoint_name

        x = _NCHWConv(self.features, dtype=self.dtype, use_bias=True, name="Conv_0")(x_cm)
        x = checkpoint_name(x, "conv_out")
        x = make_norm(self.norm)(x)
        return leaky_relu(x)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for _NCHWConv: declares the SAME param
    paths/shapes/inits ('kernel' he_normal + 'bias' zeros) so the fused
    Pallas mode's checkpoint tree is identical to concat/concat_cm."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return w, b


class _NormParams(nn.Module):
    """Parameter-only stand-in for blocks.GroupNorm (scale ones, bias
    zeros), consumed by the fused kernel's in-kernel GroupNorm."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return s, b


class _FusedCNA(nn.Module):
    """The corr+concat+conv+GroupNorm+LeakyReLU chain as ONE Pallas
    megakernel (ops/pallas/skipfuse.py). Named 'ConvNormAct_0' by SkipFuse
    so its Conv_0/GroupNorm_0 params are path-identical to the concat_cm
    layout (checkpoints transfer; same init values). Forward-only: serving
    remap, training keeps the unfused modes."""

    features: int
    radius: int
    stride: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, q_cm, m_cm):
        import jax as _jax

        from csof_tpu.ops.pallas.skipfuse import fused_skip_fuse

        ci = 2 * q_cm.shape[0] + (2 * self.radius + 1) ** 2
        w, b = _ConvParams(self.features, ci, name="Conv_0")()
        s, nb = _NormParams(self.features, name="GroupNorm_0")()
        return fused_skip_fuse(
            q_cm, m_cm, w, b, s, nb, radius=self.radius, stride=self.stride,
            num_groups=self.num_groups,
            interpret=_jax.default_backend() != "tpu",
        )


class SkipFuse(nn.Module):
    """Fuse (query, memory, correlation) skips into one feature map.

    Modes (cfg.corr_fuse):
    - concat: 3x3 ConvNormAct over the raw channel concat — the reference's
      shape (ref: SegFlowGaussian.py:1374-1386). The concat materializes a
      (C_q + C_m + 81)-channel buffer whose odd widths (145/209/337) the
      TPU pads to the next 128-lane multiple.
    - split: mathematically IDENTICAL to concat (a conv is linear in its
      input channels, so conv(q⊕m⊕corr) == conv_q(q)+conv_m(m)+conv_c(corr)
      with the bias kept once), but never materializes the concat.
    - project: a 1x1 conv takes corr (81 ch) to the skip width first —
      a low-rank factorization of the corr part of the fuse conv. Cheaper,
      slightly less expressive; capacity trade documented in
      docs/BENCHMARKS.md.
    - mean1: diagnostic — corr collapses to its channel mean (1 ch) so the
      corr tensor is consumed but the fuse conv stays narrow; isolates the
      correlation-kernel cost from the conv-width cost in ablations.
    - fused_cm: the whole chain (correlation INCLUDED — the caller passes
      no corr) as one Pallas megakernel; same math and param tree as
      concat/concat_cm up to bf16 accumulation order. Called UNBATCHED
      (C, H, W) channel-major. Serving-only (no VJP); the sim-map sow is
      computed by the caller only when intermediates are collected. See
      ops/pallas/skipfuse.py.
    """

    features: int
    mode: str = "concat"
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    radius: int = 4
    stride: int = 1

    @nn.compact
    def __call__(self, q, m, corr, corr_cm: bool = False, q_pre=None,
                 q_cmi=None, m_cmi=None):
        if self.mode == "fused_cm":
            # q_cmi/m_cmi are UNBATCHED (C, H, W); corr must be None (the
            # kernel computes it); q/m are accepted for shape symmetry only
            assert corr is None, "fused_cm computes the correlation itself"
            return _FusedCNA(
                self.features, radius=self.radius, stride=self.stride,
                name="ConvNormAct_0",
            )(q_cmi.astype(self.dtype), m_cmi.astype(self.dtype))
        if self.mode == "concat_cm":
            # channel-major concat -> NCHW ConvNormAct. Exact same math and
            # param paths as concat (ConvNormAct_0/Conv_0 + norm), but the
            # concat consumes the caller's existing channel-major tensors:
            # the hoisted q_cm skips, the per-level m transpose that the
            # corr kernel needs anyway (shared via m_cm=True), and the
            # kernel's native channel-major corr — so the per-step corr
            # output transpose and the in-kernel m transpose disappear, and
            # the odd-width concat (145/209/337 ch) rides the UNTILED
            # leading axis instead of lane-padding to the next 128 multiple.
            parts = [q_cmi, m_cmi] + ([] if corr is None else [corr])
            return _NCHWConvNormAct(
                self.features, norm=self.norm, dtype=self.dtype,
                name="ConvNormAct_0",
            )(jnp.concatenate(parts, axis=1))
        if corr_cm and self.mode != "split":
            corr = jnp.moveaxis(corr, 1, -1)
            corr_cm = False
        if corr is None or self.mode == "concat":
            parts = [q, m] + ([] if corr is None else [corr])
            return ConvNormAct(self.features, (3, 3), norm=self.norm, dtype=self.dtype)(
                jnp.concatenate(parts, axis=-1)
            )
        if self.mode == "split":
            y = (
                # q_pre = conv_q(q) precomputed T-batched OUTSIDE the scan
                # (cfg.fuse_q_hoist); the in-step conv_q params then don't
                # exist — hoist_fuse_q_params maps checkpoints between the
                # two layouts
                (q_pre if q_pre is not None else
                 nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                         kernel_init=nn.initializers.he_normal(), name="conv_q")(q))
                + nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                          dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
                          name="conv_m")(m)
                + (
                    _NCHWConv(self.features, dtype=self.dtype, name="conv_corr")(corr)
                    if corr_cm
                    else nn.Conv(
                        self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
                        name="conv_corr")(corr)
                )
            )
            return leaky_relu(make_norm(self.norm)(y))
        if self.mode == "project":
            proj = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                           kernel_init=nn.initializers.he_normal(), name="corr_proj")(corr)
            return ConvNormAct(self.features, (3, 3), norm=self.norm, dtype=self.dtype)(
                jnp.concatenate([q, m, proj], axis=-1)
            )
        if self.mode == "mean1":
            return ConvNormAct(self.features, (3, 3), norm=self.norm, dtype=self.dtype)(
                jnp.concatenate([q, m, jnp.mean(corr, axis=-1, keepdims=True)], axis=-1)
            )
        raise ValueError(f"unknown corr_fuse mode {self.mode!r}")


class SegFlowStep(nn.Module):
    """One temporal step: encode the memory state, correlate against the
    (pre-computed) query features, cross-attend, update GRU, decode flow.

    TPU note: everything that does NOT depend on the temporal recurrence is
    hoisted OUT of this step by SegFlow — the query encoder and the whole
    segmentation decoder run once, batched over all T frames, instead of as
    T tiny per-step kernels inside the scan (the per-frame work here is
    ~0.1 GFLOP, far too small to utilize the MXU from inside a sequential
    loop). Only the genuinely recurrent path (memory encoder on the
    flow-warped state, correlation, attention, GRU, flow decoder) stays."""

    cfg: SegFlowModelConfig
    num_classes: int

    @nn.compact
    def __call__(self, carry, inputs, prime: bool = False):
        import os

        # trace-time perf-diagnostic ablations (tools/bench_explore.py
        # 'isolate' sweep ONLY — never set in production; changes both the
        # math and the param tree): comma list of warp|attn|menc|flowdec
        ablate = set(
            filter(None, os.environ.get("CSOF_SEGFLOW_ABLATE", "").split(","))
        )
        frame, q_skips, q_skips_cm, q_pre, t_idx, dist = inputs
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        # cum_flow rides the carry CHANNEL-MAJOR (2, H, W): a channels-last
        # (H, W, 2) buffer is lane-padded 2->128 by the TPU compiler (64x
        # memory), and the scan saves one per step for the backward pass —
        # the measured cause of the b=8 training OOM (docs/BENCHMARKS.md)
        hidden, cum_flow, prev_bottleneck, x0, prev_frame = carry

        # `prime=True` is the frame-0 specialization used by the Python-loop
        # temporal path (SegFlow below): frame 0's flow step is IDENTITY by
        # construction (the reference only predicts flow for transitions
        # 1..T-1, ref: SegFlowGaussian.py:1330-1445; our scan gates frame-0
        # flow to zero), so the flow decoder's output — and the level-0/1
        # correlations + skip fuses that ONLY feed it — are dead work. The
        # prime step computes exactly what frame 0 contributes to the carry
        # (memory encoding, bottleneck-level corr+fuse, attention, GRU) and
        # emits the identity outputs directly. Exact: warp(frame, 0) is the
        # two-hot selector with weights {1, 0} == frame bit-for-bit, so
        # error == 0 and every skipped term is algebraically zero or unused.
        # Param values are unchanged too — flax derives init RNGs from
        # module PATHS, and every path this branch skips is created by the
        # later full steps of the same shared module.
        if prime:
            registered = frame
            error = jnp.zeros_like(frame)
            flow_cl = jnp.zeros((*frame.shape[:2], 2), jnp.float32)
            memory_in = jnp.concatenate(
                [x0, prev_frame, flow_cl.astype(frame.dtype), error, registered],
                axis=-1,
            )
        elif "warp" in ablate:
            registered = frame
            error = registered - x0
            memory_in = jnp.concatenate(
                [x0, prev_frame, jnp.moveaxis(cum_flow, 0, -1), error, registered],
                axis=-1,
            )
        else:
            registered = warp_image_cm(frame, cum_flow, padding="border")
            error = registered - x0
            memory_in = jnp.concatenate(
                [x0, prev_frame, jnp.moveaxis(cum_flow, 0, -1), error, registered],
                axis=-1,
            )  # 6 channels (ref: SegFlowGaussian.py:1343)

        if "menc" in ablate:
            m_skips = list(q_skips)
        else:
            m_skips = Encoder(
                cfg.out_encoder_dims, cfg.norm, dtype, name="memory_encoder"
            )(memory_in.astype(dtype)[None])
            m_skips = [s[0] for s in m_skips]
        q_skips = list(q_skips)

        # per-scale local correlation fused into the query skips.
        # split mode keeps the corr in the kernel's native CHANNEL-MAJOR
        # layout all the way into an NCHW fuse conv (no output transpose
        # glue); concat/project/mean1 need channels-last for their concat
        mode = cfg.corr_fuse
        if mode == "fused_cm" and not cfg.use_cost_volume:
            mode = "concat_cm"  # nothing to fuse in-kernel; param-compatible
        out_cm = mode in ("split", "concat_cm")
        fused = []
        n_levels = len(q_skips)
        for lvl, (q, m) in enumerate(zip(q_skips, m_skips)):
            if prime and lvl < n_levels - 1:
                # frame-0 specialization: fused[0..n-2] feed only the (dead)
                # flow decoder; keep placeholders so fused[-1] stays the
                # bottleneck input
                fused.append(None)
                continue
            if mode == "fused_cm":
                # the whole corr+concat+conv+norm+act chain as ONE Pallas
                # megakernel per level (ops/pallas/skipfuse.py) — called
                # UNBATCHED channel-major; the outer model vmap folds into
                # the kernel's batch grid.
                m_cm_f = jnp.moveaxis(m, -1, 0)
                fused.append(SkipFuse(
                    q.shape[-1], mode="fused_cm", norm=cfg.norm, dtype=dtype,
                    radius=cfg.corr_radius[lvl], stride=cfg.corr_stride[lvl],
                    name=f"skip_fuse_{lvl}",
                )(None, None, None, q_cmi=q_skips_cm[lvl], m_cmi=m_cm_f))
                if self.is_mutable_collection("intermediates"):
                    # sim-map observability only when something collects it
                    # (TB visualizer); the serving path never pays for it
                    corr_v = local_correlation_volume(
                        q_skips_cm[lvl], m_cm_f,
                        radius=cfg.corr_radius[lvl],
                        stride=cfg.corr_stride[lvl],
                        q_cm=True, out_cm=True, m_cm=True,
                    )
                    self.sow(
                        "intermediates", f"sim_{lvl}",
                        jnp.max(corr_v.astype(jnp.float32), axis=0),
                    )
                continue
            # concat_cm: ONE per-level m transpose, shared between the corr
            # kernel (m_cm=True skips its internal transpose) and the
            # channel-major fuse concat
            m_cm_l = (
                jnp.moveaxis(m, -1, 0) if mode == "concat_cm" else None
            )
            corr = None
            if cfg.use_cost_volume:
                # raw (bf16) activations: both impls accumulate the channel
                # reduction in f32 internally and return the input dtype, so
                # upcasting here would only double the kernel's byte traffic.
                # The query goes in CHANNEL-MAJOR (transposed once for all T
                # outside the loop): ~80% of the pallas call's cost was the
                # per-step layout glue around the kernel (docs/BENCHMARKS.md)
                corr = local_correlation_volume(
                    q_skips_cm[lvl], m if m_cm_l is None else m_cm_l,
                    radius=cfg.corr_radius[lvl],
                    stride=cfg.corr_stride[lvl],
                    q_cm=True,
                    out_cm=out_cm,
                    m_cm=m_cm_l is not None,
                ).astype(dtype)
            fused.append(
                SkipFuse(q.shape[-1], mode=mode, norm=cfg.norm, dtype=dtype,
                         name=f"skip_fuse_{lvl}")(q[None], m[None],
                                                  None if corr is None else corr[None],
                                                  corr_cm=out_cm,
                                                  q_pre=None if q_pre is None
                                                  else q_pre[lvl][None],
                                                  q_cmi=None if m_cm_l is None
                                                  else q_skips_cm[lvl][None],
                                                  m_cmi=None if m_cm_l is None
                                                  else m_cm_l[None])[0]
            )
            if cfg.use_cost_volume:
                # similarity-map observability: best local correlation per
                # pixel, for the TB visualizer (ref: visualization.py:370
                # log_sim_images on the reference's per-scale 'sim' outputs)
                self.sow(
                    "intermediates", f"sim_{lvl}",
                    jnp.max(corr.astype(jnp.float32), axis=0 if out_cm else -1),
                )

        cur = fused[-1]
        # inter-frame distance conditioning (the reference feeds the sampled
        # frame-spacing vector to its temporal modules,
        # ref: dataset_loading.py:6452 `distance`): sine-embed the scalar and
        # add it to the current bottleneck features
        demb = jnp.concatenate(
            [jnp.sin(dist * (2.0 ** jnp.arange(4))), jnp.cos(dist * (2.0 ** jnp.arange(4)))]
        )
        cur = cur + nn.Dense(cur.shape[-1], dtype=dtype, name="dist_embed")(
            demb.astype(dtype)
        )[None, None, :]
        if "attn" in ablate:
            bottleneck = jnp.concatenate([cur, cur], axis=-1).astype(dtype)
        elif cfg.attn_fused:
            # both bottlenecks in ONE pair-batched attention call: params are
            # stacked on a leading axis of 2 (pair 0 = prev-matching, pair 1
            # = ED+motion), so each projection/norm/FFN is a single batch-2
            # kernel instead of two serial batch-1 ones. Math identical to
            # the unfused path (fuse_bottleneck_params maps checkpoints).
            dual = nn.vmap(
                CrossAttentionLayer,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
            )(cfg.d_model, cfg.bottleneck_heads, cfg.dim_feedforward, dtype,
              name="bottleneck_dual")
            b12 = dual(
                jnp.stack([cur, cur]),
                jnp.stack([prev_bottleneck, m_skips[-1]]),
                jnp.stack([prev_bottleneck, hidden]),
            )
            bottleneck = jnp.concatenate([b12[0], b12[1]], axis=-1).astype(dtype)
        else:
            # bottleneck 1: match current against previous-frame bottleneck
            b1 = CrossAttentionLayer(
                cfg.d_model, cfg.bottleneck_heads, cfg.dim_feedforward, dtype, name="bottleneck_prev"
            )(cur, prev_bottleneck, prev_bottleneck)
            # bottleneck 2: match against the ED (first) frame + past motion (GRU h)
            b2 = CrossAttentionLayer(
                cfg.d_model, cfg.bottleneck_heads, cfg.dim_feedforward, dtype, name="bottleneck_ed"
            )(cur, m_skips[-1], hidden)
            bottleneck = jnp.concatenate([b1, b2], axis=-1).astype(dtype)
        bottleneck = ConvNormAct(cfg.d_model, (3, 3), norm=cfg.norm, dtype=dtype)(bottleneck[None])[0]

        if cfg.use_gru:
            hidden = ConvGRUCell(cfg.d_model, (3, 3), dtype=dtype, name="gru")(
                hidden.astype(dtype), bottleneck
            )
            dec_in = hidden
        else:
            dec_in = bottleneck

        if prime:
            # identity flow step: decoder output is gated to zero anyway
            new_carry = (hidden, cum_flow, cur, x0, frame)
            zflow = jnp.zeros((2, *frame.shape[:2]), jnp.float32)
            out = {
                "flow": zflow,
                "cum_flow": cum_flow,
                "registered": frame[..., 0],
            }
            if cfg.deep_supervision:
                out["flow_ds"] = (zflow,) * max(len(cfg.out_encoder_dims) - 2, 0)
            return new_carry, out

        if "flowdec" in ablate:
            flow_out = jnp.mean(dec_in) * jnp.ones((*frame.shape[:2], 2), jnp.float32)
        else:
            flow_out, _ = Decoder(
                cfg.out_encoder_dims, 2, cfg.norm, dtype, name="flow_decoder",
                deep_supervision=cfg.deep_supervision,
                upsample=cfg.dec_upsample,
            )(dec_in, fused)

        if cfg.deep_supervision:
            dflow, flow_ds = flow_out[0], flow_out[1:]
        else:
            dflow, flow_ds = flow_out, ()

        # frame 0 anchors the sequence: its flow step is identity
        gate = (t_idx > 0).astype(dflow.dtype)
        # to channel-major before anything is stored (see carry comment)
        dflow = jnp.moveaxis(dflow, -1, 0) * gate  # (2, H, W)
        cum_flow = cum_flow + dflow  # cumulative backward flow (ref :1419)
        new_carry = (hidden, cum_flow, cur, x0, frame)
        out = {
            "flow": dflow,
            "cum_flow": cum_flow,
            # (H, W): a trailing 1-channel axis would be lane-padded 128x
            "registered": (
                frame if "warp" in ablate
                else warp_image_cm(frame, cum_flow, padding="border")
            )[..., 0],
        }
        if cfg.deep_supervision:
            # auxiliary full-res heads per decoder scale, finest-first
            # (weights 1/2^i applied in the loss; ref trainer
            # SegFlowGaussian.py:376-381 + MultipleOutputLoss2)
            out["flow_ds"] = tuple(jnp.moveaxis(f, -1, 0) * gate for f in flow_ds)
        return new_carry, out


class SegFlow(nn.Module):
    """Full video model: scan SegFlowStep over frames 1..T-1.

    Input video: (T, H, W, 1). Outputs dict of stacked per-frame results for
    frames 1..T-1 plus the frame-0 segmentation.

    Output layout convention (TPU memory, see SegFlowStep carry comment):
    flow arrays are CHANNEL-MAJOR — "flow"/"cum_flow"/"flow_ds" are
    (T, 2, H, W) and "registered" is (T, H, W). Channels-last conversion
    happens at the host/numpy boundary (inference/flow_predictor.py)."""

    cfg: SegFlowModelConfig = SegFlowModelConfig()
    num_classes: int = 4

    @nn.compact
    def __call__(self, video: jnp.ndarray, distance: jnp.ndarray | None = None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        t, h, w, _ = video.shape
        n_levels = len(cfg.out_encoder_dims)
        hb, wb = h // (2 ** (n_levels - 1)), w // (2 ** (n_levels - 1))

        # --- batched (non-recurrent) phase: T frames as one batch ---------
        # The query encoder and the segmentation decoder depend only on the
        # current frame, never on the recurrence, so they run ONCE over all
        # T frames. GroupNorm statistics are per-sample, so this is
        # math-identical to encoding frame-by-frame inside the scan — but
        # the convs see batch T (x outer vmap batch) instead of batch 1,
        # which is what actually fills the MXU (measured: the scan-internal
        # version ran at <1% MFU; per-frame work is ~0.1 GFLOP).
        q_skips_t = Encoder(cfg.out_encoder_dims, cfg.norm, dtype, name="query_encoder")(
            video.astype(dtype)
        )
        seg_out, _ = Decoder(
            cfg.out_encoder_dims, self.num_classes, cfg.norm, dtype,
            name="seg_decoder", head_init_scale=1e5,
            deep_supervision=cfg.deep_supervision,
            upsample=cfg.dec_upsample,
        )(q_skips_t[-1], q_skips_t)
        if cfg.deep_supervision:
            seg_logits, seg_ds = seg_out[0], seg_out[1:]
        else:
            seg_logits, seg_ds = seg_out, ()

        # channel-major copies of the query skips for the correlation
        # kernel: ONE T-batched transpose per level here instead of one per
        # (frame, level) inside the loop — the per-call layout glue was
        # ~80% of the pallas corr cost (docs/BENCHMARKS.md late round 3)
        q_skips_cm_t = [jnp.moveaxis(s, -1, 1) for s in q_skips_t]

        # split-mode fuse_q_hoist: the query-side third of each SkipFuse conv
        # depends only on the hoisted query skips, so run it ONCE, T-batched,
        # here instead of as `levels` serial batch-1 convs per scan step
        # (exact same math — a conv is linear in its input channels)
        if cfg.corr_fuse == "split" and cfg.fuse_q_hoist:
            q_pre_t = tuple(
                nn.Conv(s.shape[-1], (3, 3), padding="SAME", dtype=dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"fuse_q_{lvl}")(s)
                for lvl, s in enumerate(q_skips_t)
            )
        else:
            q_pre_t = None

        # --- recurrent phase: scan the flow path over frames --------------
        x0 = video[0]
        hidden0 = jnp.zeros((hb, wb, cfg.d_model), dtype)
        prev_b0 = jnp.zeros((hb, wb, cfg.d_model), dtype)
        carry0 = (hidden0, jnp.zeros((2, h, w), jnp.float32), prev_b0, x0, x0)

        # scan over ALL frames (frame 0 included with an identity flow step);
        # optional remat trades recompute for T-x activation memory
        step_cls = nn.remat(SegFlowStep) if cfg.remat else SegFlowStep
        if distance is None:
            distance = jnp.zeros((t,), jnp.float32)

        def run_frames(step, carry):
            """Python-unrolled loop over all T frames with the frame-0 prime
            specialization (exact dead-work elimination; see SegFlowStep)."""
            per_t = []
            for i in range(t):
                inputs_i = (
                    video[i], tuple(s[i] for s in q_skips_t),
                    tuple(s[i] for s in q_skips_cm_t),
                    None if q_pre_t is None else tuple(s[i] for s in q_pre_t),
                    jnp.int32(i), distance[i],
                )
                if i == 0 and not cfg.remat:
                    # never pass the flag through nn.remat — jax.checkpoint
                    # would trace the Python bool (TracerBoolConversionError)
                    carry, o = step(carry, inputs_i, prime=True)
                else:
                    carry, o = step(carry, inputs_i)
                per_t.append(o)
            return carry, jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=0), *per_t
            )

        name = "ScanCheckpointSegFlowStep_0" if cfg.remat else "ScanSegFlowStep_0"
        if cfg.scan_while1 and not cfg.remat:
            # the full unrolled loop (prime + T-1 full steps) as the body of
            # ONE length-1 nn.scan trip: combines the while-op program form
            # (measured faster than equivalent straight-line code on this
            # backend: 1572 vs 1514/1482 f/s) with the frame-0 prime's dead
            # work elimination (loop path: 1361 -> 1482 f/s). Function-form
            # scan over the name-pinned step instance keeps the param tree
            # IDENTICAL to the other temporal paths.
            step = step_cls(cfg=cfg, num_classes=self.num_classes, name=name)
            scanned = nn.scan(
                lambda stp, carry, _: run_frames(stp, carry),
                variable_broadcast="params",
                variable_axes={"intermediates": 0},
                split_rngs={"params": False},
                length=1,
            )
            _, outs = scanned(step, carry0, None)
            outs = jax.tree_util.tree_map(lambda x: x[0], outs)
        elif cfg.scan_unroll > t:
            # fully-unrolled temporal loop: T is small and static (<=~40
            # cine frames), so a plain Python loop gives XLA a straight-line
            # program with no while-op layout constraints at all. One shared
            # step module, explicitly named to match the nn.scan path's
            # auto-name => the param tree is IDENTICAL (nn.scan broadcasts
            # params; checkpoints transfer both ways).
            # frame 0 runs the carry-priming specialization (no flow
            # decoder, no level-0/1 corr+fuse — all dead work; see
            # SegFlowStep prime docstring). Kept off under remat.
            step = step_cls(cfg=cfg, num_classes=self.num_classes, name=name)
            _, outs = run_frames(step, carry0)
        else:
            # NOTE measured round 4: hoisting the frame-0 prime step OUT of
            # nn.scan (function-form scan over frames 1..T-1 sharing the
            # step module with an outside prime call) is a NET LOSS on the
            # axon backend — 1514 vs 1572 f/s at the serving config despite
            # strictly less work. The while-op program form is consistently
            # faster than equivalent straight-line code here (same reason
            # the plain Python loop measured 1361/1482 vs 1484/1572); the
            # prime specialization therefore lives only on the Python-loop
            # path above.
            scan = nn.scan(
                step_cls,
                variable_broadcast="params",
                variable_axes={"intermediates": 0},  # stack sown maps over T
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
                unroll=t if cfg.scan_unroll == -1 else min(cfg.scan_unroll, t),
            )(cfg=cfg, num_classes=self.num_classes)
            _, outs = scan(
                carry0,
                (video, tuple(q_skips_t), tuple(q_skips_cm_t), q_pre_t,
                 jnp.arange(t), distance),
            )
        outs["seg_logits"] = seg_logits
        if cfg.deep_supervision:
            outs["seg_ds"] = seg_ds
        return outs


def fuse_bottleneck_params(variables: dict) -> dict:
    """Map checkpoint params between the attention-bottleneck layouts.

    With `attn_fused` ON, the two cross-attention bottlenecks' params are
    STACKED on a leading pair axis under `bottleneck_dual` (pair 0 = the
    `bottleneck_prev` weights, pair 1 = `bottleneck_ed`) instead of living
    as two sibling scopes. The weights are the same tensors either way, so
    a checkpoint trained unfused loads fused after this move (and the fused
    math is identical). Returns a new variables dict; input not mutated."""
    import copy

    variables = copy.deepcopy(variables)
    params = variables["params"]
    step_scopes = [
        k for k in params
        if isinstance(params[k], dict)
        and "bottleneck_prev" in params[k]
        and "bottleneck_ed" in params[k]
    ]
    for scope in step_scopes:
        prev = params[scope].pop("bottleneck_prev")
        ed = params[scope].pop("bottleneck_ed")
        params[scope]["bottleneck_dual"] = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), prev, ed
        )
    return variables


def hoist_fuse_q_params(variables: dict) -> dict:
    """Map split-mode checkpoint params between the fuse_q layouts.

    With `fuse_q_hoist` ON, the SkipFuse conv_q params live at the SegFlow
    top level (`fuse_q_{lvl}`) instead of inside the scan-step scope
    (`<ScanSegFlowStep_0>/skip_fuse_{lvl}/conv_q`). The weights are the
    SAME tensors either way (the hoist changes only where the conv runs),
    so a checkpoint trained in one layout loads in the other after this
    move. Returns a new variables dict; input is not mutated."""
    import copy

    variables = copy.deepcopy(variables)
    params = variables["params"]
    step_scopes = [
        k for k in params
        if isinstance(params[k], dict)
        and any(n.startswith("skip_fuse_") for n in params[k])
    ]
    for scope in step_scopes:
        for name in list(params[scope]):
            if name.startswith("skip_fuse_") and "conv_q" in params[scope][name]:
                lvl = name.removeprefix("skip_fuse_")
                params[f"fuse_q_{lvl}"] = params[scope][name].pop("conv_q")
    return variables
