"""Isolate 3D-conv kernel throughput at Task002 3d_fullres geometry.

The epoch benchmark (tools/bench_epoch.py) achieves ~19 TF/s (logical) on
the whole train step. With C_out=32 the MXU's 128-lane output tile is 25%
occupied, so the *logical* ceiling for the full-res stages is ~49 TF/s on a
197 TF/s v5e — this probe measures where individual convs actually land and
which reformulations help:

  fwd          conv forward only
  grad         value_and_grad of mean(conv(x)^2) wrt (x, w)
  z2d          the (1,3,3) conv recast as 2D conv with z folded into batch
  c128         same spatial volume with C=128 (the occupancy control)

Probe-honesty rules (hard-won; see the axon-benchmark-elision memory note):
- the chain must feed each conv's OUTPUT into the next conv's input
  (y = conv(y)): a scalar-rescaled-input chain collapses via linearity
  (conv(x*c) = c*conv(x)) and XLA executes ONE conv for the whole chain;
- when in/out shapes differ, the feedback must be an elementwise (per-pixel)
  factor derived from y — scalar factors collapse the same way;
- grad probes need a QUADRATIC loss: grad of sum(conv(x)) has an all-ones
  cotangent and both dgrad/wgrad simplify to cheap window sums;
- jax.block_until_ready is UNRELIABLE on this backend (sometimes returns
  before execution finishes): sync with a host FETCH of the threaded final
  state, once after the rep loop (tools/_timing.py);
- sanity-check: nothing real reads above the 197 TF/s bf16 peak.

Usage: python tools/bench_conv3d.py [case ...]   (default: all)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

PATCH = (80, 192, 160)
PEAK_BF16_TFLOPS = 197.0  # v5e


def _time_state(step, state, reps=8):
    from tools._timing import time_state

    return time_state(step, state, reps)


def conv_nd(x, w, strides=None):
    import jax

    nd = w.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, strides or (1,) * nd, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC"),
    )


CHAIN = 8  # sequential convs per timed call (output-chained, can't collapse)


def run_case(name, x_shape, w_shape, strides=None, grad=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*x_shape), jnp.float32)
    w = jnp.asarray(rng.rand(*w_shape) * 0.1, jnp.bfloat16)
    chainable = w_shape[-2] == w_shape[-1] and not strides

    def f(x, w):
        y = x.astype(jnp.bfloat16)
        tot = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = conv_nd(y, w, strides)
            s = jnp.mean(jnp.square(out.astype(jnp.float32)))
            tot = tot + s
            if chainable:
                # renormalize so magnitudes stay O(1) through the chain
                y = out * jax.lax.rsqrt(jnp.maximum(s, 1e-6)).astype(out.dtype)
            else:
                # shapes differ: fold an elementwise (per-pixel, channel-mean)
                # factor of the output back into the input — a SCALAR factor
                # would collapse the chain via conv linearity
                fb = jnp.tanh(jnp.mean(out.astype(jnp.float32), axis=-1, keepdims=True))
                for ax, st in enumerate(strides or ()):
                    if st != 1:
                        fb = jnp.repeat(fb, st, axis=ax + 1)
                fb = fb[tuple(slice(0, d) for d in y.shape[:-1])]
                y = y * (1.0 + 0.001 * fb).astype(y.dtype)
        return tot

    eps = 2.0 ** -7

    def _scale(k, total):
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return 1.0 + eps * sign + total * 1e-30

    k0 = jnp.int32(0)
    if grad:
        vg = jax.value_and_grad(f, argnums=(0, 1))

        @jax.jit
        def step(x, w, k):
            loss, (dx, dw) = vg(x, w)
            probe = loss + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw.astype(jnp.float32))
            return x * _scale(k, probe), w, k + 1

    else:

        @jax.jit
        def step(x, w, k):
            total = f(x, w)
            return x * _scale(k, total), w, k + 1

    sec = _time_state(step, (x, w, k0)) / CHAIN
    spatial = np.prod(x_shape[1:-1]) / np.prod(strides or (1,))
    macs = spatial * x_shape[0] * np.prod(w_shape[:-2]) * w_shape[-2] * w_shape[-1]
    flops = 2 * macs * (3 if grad else 1)  # grad ~ fwd + dx + dw
    rec = {
        "case": name, "ms": round(sec * 1e3, 3),
        "tflops": round(flops / sec / 1e12, 1),
        "mfu_pct": round(flops / sec / 1e12 / PEAK_BF16_TFLOPS * 100, 1),
        "ceiling_pct_of_peak": round(min(w_shape[-1], 128) / 128 * 100, 1),
    }
    if rec["tflops"] > PEAK_BF16_TFLOPS:
        rec["BROKEN_PROBE"] = "reads above hardware peak"
    print(json.dumps(rec), flush=True)
    return rec


def pack_w_shift(w, P):
    """Shift-pack a (ky,kx,ci,co) kernel along x: P output columns become
    P*co 'virtual output channels' of a stride-P conv with kernel kx+P-1.

    y[b,h,P*j+dx,co] == conv(x,w)[b,h,P*j+dx,co] computed as output channel
    (dx,co) of conv(x, w_packed, strides=(1,P), padding=((pad,pad),(pad,pad)))
    at (h,j): w_packed[ky,kx',ci,dx*co_n+co] = w[ky,kx'-dx,ci,co].  EXACT;
    inflates kernel-x FLOPs by (kx+P-1)/kx but fills P*co of the MXU's 128
    output lanes (co=32, P=4 -> 2x FLOPs for 4x lane occupancy)."""
    import jax.numpy as jnp

    ky, kx, ci, co = w.shape
    wp = jnp.zeros((ky, kx + P - 1, ci, P, co), w.dtype)
    for dx in range(P):
        wp = wp.at[:, dx : dx + kx, :, dx, :].set(w)
    return wp.reshape(ky, kx + P - 1, ci, P * co)


def run_xpack_case(name, x_shape, w_shape, P=4, grad=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    b, h, wd, c = x_shape
    ky, kx, ci, co = w_shape
    assert wd % P == 0 and kx == 3
    x = jnp.asarray(rng.rand(*x_shape), jnp.float32)
    w = jnp.asarray(rng.rand(*w_shape) * 0.1, jnp.bfloat16)
    pad = (kx - 1) // 2

    def one(y, w):
        wp = pack_w_shift(w, P)
        out = jax.lax.conv_general_dilated(
            y, wp, (1, P), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(b, h, wd // P, P, co).reshape(b, h, wd, co)

    def f(x, w):
        y = x.astype(jnp.bfloat16)
        tot = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = one(y, w)
            s = jnp.mean(jnp.square(out.astype(jnp.float32)))
            tot = tot + s
            y = out * jax.lax.rsqrt(jnp.maximum(s, 1e-6)).astype(out.dtype)
        return tot

    eps = 2.0 ** -7

    def _scale(k, total):
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return 1.0 + eps * sign + total * 1e-30

    k0 = jnp.int32(0)
    if grad:
        vg = jax.value_and_grad(f, argnums=(0, 1))

        @jax.jit
        def step(x, w, k):
            loss, (dx, dw) = vg(x, w)
            probe = loss + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw.astype(jnp.float32))
            return x * _scale(k, probe), w, k + 1

    else:

        @jax.jit
        def step(x, w, k):
            return x * _scale(k, f(x, w)), w, k + 1

    sec = _time_state(step, (x, w, k0)) / CHAIN
    # report USEFUL flops (the logical conv), so numbers compare directly
    # against the unpacked cases; the packed op executes (kx+P-1)/kx more
    macs = b * h * wd * ky * kx * ci * co
    flops = 2 * macs * (3 if grad else 1)
    rec = {
        "case": name, "ms": round(sec * 1e3, 3),
        "tflops_useful": round(flops / sec / 1e12, 1),
        "mfu_pct": round(flops / sec / 1e12 / PEAK_BF16_TFLOPS * 100, 1),
        "inflate": round((kx + P - 1) / kx, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main(cases):
    d, h, w = PATCH
    all_cases = {
        # level-0 encoder: (1,3,3) kernels, C 32
        "l0_133_c32_fwd": lambda: run_case("l0_133_c32_fwd", (1, d, h, w, 32), (1, 3, 3, 32, 32)),
        "l0_133_c32_grad": lambda: run_case("l0_133_c32_grad", (1, d, h, w, 32), (1, 3, 3, 32, 32), grad=True),
        # the same op as a 2D conv with z folded into batch
        "l0_z2d_c32_fwd": lambda: run_case("l0_z2d_c32_fwd", (d, h, w, 32), (3, 3, 32, 32)),
        "l0_z2d_c32_grad": lambda: run_case("l0_z2d_c32_grad", (d, h, w, 32), (3, 3, 32, 32), grad=True),
        # level-0 decoder: full 3x3x3 at full res, C 32 (the big one)
        "l0_333_c32_fwd": lambda: run_case("l0_333_c32_fwd", (1, d, h, w, 32), (3, 3, 3, 32, 32)),
        "l0_333_c32_grad": lambda: run_case("l0_333_c32_grad", (1, d, h, w, 32), (3, 3, 3, 32, 32), grad=True),
        "l0_333_c64to32_grad": lambda: run_case("l0_333_c64to32_grad", (1, d, h, w, 64), (3, 3, 3, 64, 32), grad=True),
        # level-1: half res, C 64
        "l1_333_c64_grad": lambda: run_case("l1_333_c64_grad", (1, d // 2, h // 2, w // 2, 64), (3, 3, 3, 64, 64), grad=True),
        # occupancy control: same voxels, C 128 (full lane tile)
        "l2_333_c128_grad": lambda: run_case("l2_333_c128_grad", (1, d // 2, h // 4, w // 4, 128), (3, 3, 3, 128, 128), grad=True),
        # strided encoder downsample conv
        "l01_down_grad": lambda: run_case("l01_down_grad", (1, d, h, w, 32), (3, 3, 3, 32, 64), strides=(1, 2, 2), grad=True),
        # shift-packed output channels along x (z folded into batch):
        # C=32, P=4 -> 128 lanes, 2x FLOP inflation, net ~2x hoped
        "l0_xpack4_fwd": lambda: run_xpack_case("l0_xpack4_fwd", (d, h, w, 32), (3, 3, 32, 32), P=4),
        "l0_xpack4_grad": lambda: run_xpack_case("l0_xpack4_grad", (d, h, w, 32), (3, 3, 32, 32), P=4, grad=True),
        "l0_xpack2_grad": lambda: run_xpack_case("l0_xpack2_grad", (d, h, w, 32), (3, 3, 32, 32), P=2, grad=True),
        # C=64 half-res with P=2 (128 lanes, 1.33x inflation)
        "l1_xpack2_grad": lambda: run_xpack_case("l1_xpack2_grad", (d // 2, h // 2, w // 2, 64), (3, 3, 64, 64), P=2, grad=True),
        # --- space-to-depth (2x2) decision probes (ROADMAP 3D lever) ------
        # A stride-1 3x3 C32 conv on the full-res grid is EXACTLY four
        # per-phase (2,2) convs on the packed (H/2, W/2, 4*32=128) grid
        # (each output phase reads a 2x2 window of packed cells). Total
        # useful-FLOP inflation 16/9 = 1.78x, but input lanes, contraction
        # (4*128=512) and (for the merged shape) output lanes are all
        # tile-exact. These probes time the RAW shapes; useful = raw/1.78.
        # Decision rule: phase/pack raw > ~52 TF/s beats the measured 29
        # TF/s C=32 plateau; full3 (one k=3 packed conv with structural
        # zeros, 4x inflation) needs raw > 116.
        # via-2D inner-conv rates at the deeper levels (what the model
        # actually runs): is the 29 TF/s plateau C=32-specific or global?
        "l1_z2d_c64_grad": lambda: run_case("l1_z2d_c64_grad", (d, h // 2, w // 2, 64), (3, 3, 64, 64), grad=True),
        "l2_z2d_c128_grad": lambda: run_case("l2_z2d_c128_grad", (d // 2, h // 4, w // 4, 128), (3, 3, 128, 128), grad=True),
        "l3_z2d_c256_grad": lambda: run_case("l3_z2d_c256_grad", (d // 4, h // 8, w // 8, 256), (3, 3, 256, 256), grad=True),
        # s2d-packed level-1 (C64 -> 256 packed)
        "s2d_l1_full3_grad": lambda: run_case("s2d_l1_full3_grad", (d, h // 4, w // 4, 256), (3, 3, 256, 256), grad=True),
        "s2d_phase_fwd": lambda: run_case("s2d_phase_fwd", (d, h // 2, w // 2, 128), (2, 2, 128, 32)),
        "s2d_phase_grad": lambda: run_case("s2d_phase_grad", (d, h // 2, w // 2, 128), (2, 2, 128, 32), grad=True),
        "s2d_pack_fwd": lambda: run_case("s2d_pack_fwd", (d, h // 2, w // 2, 128), (2, 2, 128, 128)),
        "s2d_pack_grad": lambda: run_case("s2d_pack_grad", (d, h // 2, w // 2, 128), (2, 2, 128, 128), grad=True),
        "s2d_full3_grad": lambda: run_case("s2d_full3_grad", (d, h // 2, w // 2, 128), (3, 3, 128, 128), grad=True),
        # --- the same question at the SegFlow serving decoder geometry ----
        # (per scan step, batch 8 at the 128^2 full-res stage; fwd only).
        # dec_base: today's conv. dec_s2dzero: the merged packed conv (one
        # k=3 conv on the (64^2, 4C) grid with structural zeros; 4x FLOPs,
        # exact). dec_s2dphase: one of the four k=2 phase convs (1.78x total,
        # 4 kernels). Useful rates: zero = raw/4, phase = raw/1.78.
        "dec_base_fwd": lambda: run_case("dec_base_fwd", (8, 128, 128, 64), (3, 3, 64, 32)),
        "dec_base2_fwd": lambda: run_case("dec_base2_fwd", (8, 128, 128, 32), (3, 3, 32, 32)),
        "dec_s2dzero_fwd": lambda: run_case("dec_s2dzero_fwd", (8, 64, 64, 256), (3, 3, 256, 128)),
        "dec_s2dzero2_fwd": lambda: run_case("dec_s2dzero2_fwd", (8, 64, 64, 128), (3, 3, 128, 128)),
        "dec_s2dphase_fwd": lambda: run_case("dec_s2dphase_fwd", (8, 64, 64, 256), (2, 2, 256, 32)),
    }
    for k in (cases or all_cases):
        all_cases[k]()


if __name__ == "__main__":
    main(sys.argv[1:])
