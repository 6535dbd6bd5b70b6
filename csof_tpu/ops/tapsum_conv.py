"""Tap-sum 2D convolution: full MXU lane occupancy for narrow-channel convs.

Why: XLA lowers a KxK conv to an implicit matmul with contraction dim
K*K*Cin and OUTPUT dim Cout. The MXU is 128 lanes wide on the output dim,
so a Cout=32 conv (the finest decoder/encoder stages of every model here,
and the whole 3D fullres pipeline) occupies 25% of the lanes — the measured
~8.5 TF/s "conv plateau" at C=32 vs 26+ TF/s at C>=128
(docs/BENCHMARKS.md).

The tap-sum form factors the same conv as ONE matmul whose output dim is
the (tap, out-channel) product:

    y[n,i,j,(a,b,co)] = sum_c x[n,i,j,c] * w[a,b,c,co]        # matmul,
                                                  # output width K*K*Cout
    out[n,i,j,co]     = sum_(a,b) y[n, i+a-p, j+b-p, (a,b,co)] # K*K shifted
                                                  # adds (VPU/fusion)

Identical FLOPs, but the matmul runs with K*K*Cout output lanes (288 for a
3x3 Cout=32 conv — full occupancy) and contraction over Cin only. The
shifted adds are bandwidth work XLA fuses into one pass. Taps accumulate in
f32 and cast once, so low-precision results match the native conv's single
wide accumulation.

Use where Cout is small relative to 128 and stride is 1; for wide convs the
native lowering is already lane-full and the extra y-buffer traffic loses.
Selection is by the `CSOF_CONV2D_IMPL` env knob (native | tapsum | pallas —
pallas selects the in-VMEM cols kernel in ops/pallas/conv.py, which keeps
the widened intermediate out of HBM entirely) plus the `tapsum_worthwhile`
heuristic — measured on-chip in tools/bench_tapsum.py. Round-4 verdict:
the XLA-level tap-sum is a measured NEGATIVE at every grad geometry (the
HBM round trip for the tap intermediate dominates; docs/BENCHMARKS.md);
it is kept as the record of why the Pallas kernel exists.

ref: this replaces the hot conv path of the reference's per-frame decoder
(ref: nnunet/lib/decoder_alt.py:781 Decoder2D convs) and the nnU-Net 3D
stages (ref: generic_UNet.py conv blocks) — same math, TPU-native layout.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_f32acc(x, w, strides, padding):
    """NHWC/HWIO 2D conv with f32 ACCUMULATION that is also differentiable.

    `lax.conv_general_dilated(preferred_element_type=f32)` on low-precision
    inputs keeps the MXU's wide accumulation (one rounding instead of one
    per partial sum) — but its transpose rule then feeds the f32 cotangent
    into a conv against the bf16 kernel, which lax rejects ("requires
    arguments to have the same dtypes"). This wrapper keeps the wide-accum
    forward and defines the backward as the SAME-dtype conv vjp with the
    cotangent cast once to the input dtype — standard mixed-precision
    backward (the grads a bf16-out conv would produce).

    strides/padding must be hashable tuples (they are nondiff static args).
    """
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv2d_f32acc_fwd(x, w, strides, padding):
    return conv2d_f32acc(x, w, strides, padding), (x, w)


def _conv2d_f32acc_bwd(strides, padding, res, dy):
    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: jax.lax.conv_general_dilated(
            x_, w_, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x, w,
    )
    return vjp(dy.astype(x.dtype))


conv2d_f32acc.defvjp(_conv2d_f32acc_fwd, _conv2d_f32acc_bwd)


def tapsum_worthwhile(kh: int, kw: int, ci: int, co: int, strides=(1, 1)) -> bool:
    """Heuristic: tap-sum wins when the native conv wastes MXU output lanes
    (co < 128) and the tap product keeps the matmul lane-full without
    blowing the y-buffer (kh*kw*co within a few 128-lane tiles)."""
    if tuple(strides) != (1, 1):
        return False
    return co < 128 and kh * kw * co <= 512 and kh * kw > 1


def conv2d_tapsum(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
                  padding=None, out_dtype=None, mode: str | None = None) -> jnp.ndarray:
    """Stride-1 KxK conv in a tap-sum form.

    x: (N, H, W, Ci) [or (H, W, Ci)]; w: (Kh, Kw, Ci, Co); padding: per-axis
    (lo, hi) pairs like lax.conv (default odd-SAME). Returns x.dtype, or
    `out_dtype` if given (e.g. f32 to chain into a wider accumulation —
    the tap sum is f32 internally either way).

    mode:
    - "cols" (default): a (Kh, 1) conv whose output channels are the
      (kw-tap, Cout) product — contraction Kh*Ci, output Kw*Co lanes —
      followed by Kw shifted adds along W. The intermediate is Kw*Co wide
      (3x smaller than "taps"), so HBM traffic stays low while lane
      occupancy rises Kw-fold (96/128 for a 3x3 Cout=32 conv).
    - "taps": ONE matmul over Ci with all Kh*Kw taps on the output dim
      (288 lanes, 100% occupancy) + Kh*Kw shifted adds; maximal lanes but
      a Kh*Kw*Co-wide f32 intermediate — wins only when spatial is small.
    """
    unbatched = x.ndim == 3
    if unbatched:
        x = x[None]
    kh, kw, ci, co = w.shape
    if padding is None:
        padding = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    (pt, pb), (pl, pr) = padding
    n, h, wd, _ = x.shape
    if mode is None:
        mode = os.environ.get("CSOF_TAPSUM_MODE", "cols")

    if mode == "cols":
        # (Kh, 1) conv: contraction (Kh, Ci), output channels (Kw, Co)
        k2 = jnp.transpose(w, (0, 2, 1, 3)).reshape(kh, 1, ci, kw * co)
        # conv2d_f32acc: wide-accum forward + a transpose rule that works in
        # low precision (the raw preferred_element_type=f32 conv is not
        # differentiable on bf16 inputs — lax rejects the mixed-dtype
        # backward conv)
        y = conv2d_f32acc(
            x, k2.astype(x.dtype), (1, 1), ((pt, pb), (0, 0))
        )  # (N, Hout, W, Kw*Co) f32
        hout = h + pt + pb - kh + 1
        y = jnp.pad(y, ((0, 0), (0, 0), (pl, pr), (0, 0)))
        wout = wd + pl + pr - kw + 1
        out = None
        for b_ in range(kw):
            tap = jax.lax.slice(
                y, (0, 0, b_, b_ * co), (n, hout, b_ + wout, (b_ + 1) * co)
            )
            out = tap if out is None else out + tap
    elif mode == "taps":
        # the single lane-full matmul: (N*H*W, Ci) @ (Ci, Kh*Kw*Co)
        wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci, kh * kw * co)
        y = jax.lax.dot_general(
            x, wm.astype(x.dtype),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, H, W, Kh*Kw*Co) f32

        # shifted tap accumulation: out[i,j] = sum_ab y[i+a-pt, j+b-pl, (a,b,:)]
        # == sum over taps of a static slice of the zero-padded y
        y = jnp.pad(y, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        out = None
        for a in range(kh):
            for b_ in range(kw):
                tap = jax.lax.slice(
                    y,
                    (0, a, b_, (a * kw + b_) * co),
                    (n, a + h + pt + pb - kh + 1, b_ + wd + pl + pr - kw + 1,
                     (a * kw + b_ + 1) * co),
                )
                out = tap if out is None else out + tap
    else:
        raise ValueError(f"unknown tapsum mode {mode!r}")
    out = out.astype(x.dtype if out_dtype is None else out_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out[0] if unbatched else out


def conv2d_impl() -> str:
    return os.environ.get("CSOF_CONV2D_IMPL", "native")
