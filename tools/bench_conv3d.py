"""Isolate 3D-conv kernel throughput at Task002 3d_fullres geometry.

The epoch benchmark (tools/bench_epoch.py) achieves ~17 TF/s on the whole
train step vs the ~49 TF/s MXU ceiling for C_out=32 convs (output channels
tile 32/128 lanes). This probe measures individual convs of the U-Net's
full-res stages to find where between 17 and 49 the kernels actually land,
and which reformulations help:

  fwd          conv forward only
  grad         value_and_grad of sum(conv(x)) wrt (x, w)  (input+weight grads)
  z2d          the (1,3,3) conv recast as 2D conv with z folded into batch
  wide         same spatial volume with C=128 (the occupancy control)
  tconv        the decoder's stride-(1,2,2)/(2,2,2) ConvTranspose

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


def _time_state(step, state, reps=10):
    """Time a state-threading step whose state provably CHANGES BYTES every
    rep. The remote backend elides repeated executions whose (program, args)
    are byte-identical — both independent identical calls AND state-threaded
    steps that return their inputs unchanged read as ~0 time (the 34 PFLOP/s
    readings of the first probe versions). bench_epoch.py times honestly
    because SGD genuinely mutates params each rep; this mirrors that."""
    import jax

    state = step(*state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(*state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / reps


def conv_nd(x, w, strides=None):
    import jax

    nd = w.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, strides or (1,) * nd, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC"),
    )


CHAIN = 8  # sequential convs per timed call (data-dependent, can't overlap)


def run_case(name, x_shape, w_shape, strides=None, grad=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # Thread the state in f32 and cast to bf16 inside the step: a bf16
    # state under the alternating (1+e)(1-e) jiggle rounds back to its
    # exact starting bytes every 2 reps (1 - 2^-14 is not bf16-
    # representable), and the backend's elision cache apparently keys on
    # the large buffers only — so a period-2 cycle still reads as elided
    # (the 13.8 TF/s "l0_133_c32_fwd" readings). f32 partial products
    # never return to identical bytes.
    x = jnp.asarray(rng.rand(*x_shape), jnp.float32)
    w = jnp.asarray(rng.rand(*w_shape) * 0.1, jnp.bfloat16)

    # chain CHAIN convs through a scalar data dependency so the timed
    # program contains CHAIN serialized real convs, and thread (x, w)
    # through the timing loop so successive calls serialize too
    def f(x, w):
        total = jnp.float32(0.0)
        x = x.astype(jnp.bfloat16)
        for _ in range(CHAIN):
            y = conv_nd(x, w, strides)
            s = jnp.sum(y.astype(jnp.float32))
            total = total + s
            x = x * (1 + s * 0).astype(x.dtype)  # numerically x; forces ordering
        return total

    # per-rep multiplicative jiggle: scale x by 1 ± 2^-7 alternating (bf16-
    # representable, so the bytes of x provably change each rep; alternating
    # keeps |x| stable: (1+a)(1-a) = 1-a^2). The scalar probe result is
    # folded in at 1e-30 relative weight to keep the chain consumed without
    # perturbing the magnitude.
    eps = 2.0 ** -7

    def _scale(k, total):
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return 1.0 + eps * sign + total * 1e-30  # f32: applied to f32 state

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
    }
    for k in (cases or all_cases):
        all_cases[k]()


if __name__ == "__main__":
    main(sys.argv[1:])
