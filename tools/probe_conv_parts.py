"""Time-isolate the cols-conv kernel's parts on the real chip.

The v3 kernel measures ~12 us/grid-step at z2d (TH=32/64, Wp=256) vs ~2 us
of theoretical matmul+DMA — this probe times stripped kernel variants at
the same per-step workload to find where the balance goes:

  dma     — DMA the slab, write a constant
  matmul  — + the (3co, 3ci) x (3ci, TH*Wp) dot on a fixed VMEM operand
  im2col  — + the shift-concat + flatten building xcol from the slab
  taps    — + the two rolls/masks and the output cast (the full kernel)

Usage: python tools/probe_conv_parts.py   (on the TPU)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import numpy as np

B, H, W, C = 80, 192, 160, 32
TH = 64
WP = 256


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools._timing import time_state

    ci = co = C
    slab = TH + 2 + (16 - (TH + 2) % 16) % 16
    nt = H // TH
    rows = (nt - 1) * TH + slab
    dt = jnp.bfloat16

    def make_kernel(mode):
        def kern(w2_ref, x_hbm, o_ref, x_vmem, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            nb, ntg = pl.num_programs(0), pl.num_programs(1)
            lin = b * ntg + i
            slot = jax.lax.rem(lin, 2)
            nslot = jax.lax.rem(lin + 1, 2)

            def dma(bb, ii, sl):
                return pltpu.make_async_copy(
                    x_hbm.at[bb, :, pl.ds(ii * TH, slab), :],
                    x_vmem.at[sl], sem.at[sl],
                )

            @pl.when(lin == 0)
            def _():
                dma(b, i, slot).start()

            @pl.when(jnp.logical_and(lin + 1 < nb * ntg, i + 1 < ntg))
            def _():
                dma(b, i + 1, nslot).start()

            @pl.when(jnp.logical_and(lin + 1 < nb * ntg, i + 1 == ntg))
            def _():
                dma(b + 1, 0, nslot).start()

            dma(b, i, slot).wait()
            x = x_vmem[slot]
            if mode == "dma":
                o_ref[0] = (
                    x[:co, :TH, :].astype(jnp.float32) * 0.0 + 1.0
                ).astype(o_ref.dtype)
                return
            if mode == "matmul":
                xcol = jnp.broadcast_to(
                    x[:, :TH, :], (ci, TH, WP)
                ).reshape(ci, TH * WP)
                xcol = jnp.concatenate([xcol] * 3, axis=0)
            else:
                xcol = jnp.concatenate(
                    [x[:, a : a + TH, :] for a in range(3)], axis=0
                ).reshape(3 * ci, TH * WP)
            y = jax.lax.dot_general(
                w2_ref[...], xcol, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode in ("matmul", "im2col"):
                o_ref[0] = y[:co].reshape(co, TH, WP).astype(o_ref.dtype)
                return
            col = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (1, TH * WP), 1), WP
            )
            out = y[co : 2 * co]
            for b_, sh in ((0, -1), (2, 1)):
                yb = y[b_ * co : (b_ + 1) * co]
                rolled = pltpu.roll(yb, (-sh) % (TH * WP), axis=1)
                mask = ((col + sh >= 0) & (col + sh < W)).astype(jnp.float32)
                out = out + rolled * mask
            o_ref[0] = out.reshape(co, TH, WP).astype(o_ref.dtype)

        return kern

    rng = np.random.RandomState(0)
    x_cm = jnp.asarray(rng.rand(B, C, rows, WP).astype(np.float32), dt)
    w2 = jnp.asarray(rng.rand(3 * co, 3 * ci).astype(np.float32) * 0.1, dt)

    # harness floor: the same jit with NO pallas call at all
    @jax.jit
    def step0(x, w, k):
        o = x[:, :, :H, :] * jnp.bfloat16(1.0)
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        f = (1.0 + 2.0**-8 * sign * jnp.tanh(jnp.float32(o[0, 0, 0, 0]))).astype(dt)
        return x * f, w, k + 1

    sec = time_state(step0, (x_cm, w2, jnp.int32(0)), reps=20)
    print(f"noop(harness floor): {sec*1e3:.3f} ms total", flush=True)

    # one whole-sample DMA per batch item, row-tiles looped IN-kernel
    def kern_big(w2_ref, x_hbm, o_ref, x_vmem, sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        slot = jax.lax.rem(b, 2)
        nslot = jax.lax.rem(b + 1, 2)

        def dma(bb, sl):
            return pltpu.make_async_copy(x_hbm.at[bb], x_vmem.at[sl], sem.at[sl])

        @pl.when(b == 0)
        def _():
            dma(b, slot).start()

        @pl.when(b + 1 < nb)
        def _():
            dma(b + 1, nslot).start()

        dma(b, slot).wait()
        x = x_vmem[slot]
        for i in range(nt):
            xcol = jnp.concatenate(
                [x[:, i * TH + a : i * TH + a + TH, :] for a in range(3)], axis=0
            ).reshape(3 * ci, TH * WP)
            y = jax.lax.dot_general(
                w2_ref[...], xcol, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, i * TH : (i + 1) * TH, :] = (
                y[:co].reshape(co, TH, WP).astype(o_ref.dtype)
            )

    call_big = pl.pallas_call(
        kern_big,
        out_shape=jax.ShapeDtypeStruct((B, co, H, WP), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((3 * co, 3 * ci), lambda bb: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, co, H, WP), lambda bb: (bb, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ci, rows, WP), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def step_big(x, w, k):
        o = call_big(w, x)
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        f = (1.0 + 2.0**-8 * sign * jnp.tanh(jnp.float32(o[0, 0, 0, 0]))).astype(dt)
        return x * f, w, k + 1

    try:
        sec = time_state(step_big, (x_cm, w2, jnp.int32(0)), reps=20)
        print(f"bigdma(matmul, no taps): {sec*1e3:.3f} ms total, "
              f"{sec/B*1e6:.2f} us/sample", flush=True)
    except Exception as e:
        print(f"bigdma: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)

    for mode in ("dma", "matmul", "im2col", "taps"):
        call = pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((B, co, H, WP), dt),
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((3 * co, 3 * ci), lambda bb, ii: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, co, TH, WP), lambda bb, ii: (bb, 0, ii, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ci, slab, WP), dt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        @jax.jit
        def step(x, w, k):
            o = call(w, x)
            sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
            f = (1.0 + 2.0**-8 * sign * jnp.tanh(
                jnp.float32(o[0, 0, 0, 0])
            )).astype(dt)
            return x * f, w, k + 1

        try:
            sec = time_state(step, (x_cm, w2, jnp.int32(0)), reps=20)
            us_per_step = sec / (B * nt) * 1e6
            print(f"{mode}: {sec*1e3:.3f} ms total, {us_per_step:.2f} us/grid-step",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
