"""Mosaic capability probes for the cols-conv kernel redesign.

The first on-chip run of ops/pallas/conv.py died on
`tpu.reshape (1x80x5120xbf16) -> (80x160x32xbf16)` — a lane-SPLITTING
shape cast (5120 -> lane 32) that infer-vector-layout rejects. Each probe
here compiles one tiny kernel exercising one layout operation, so the
redesign is built on measured legality instead of guesses.

Usage: python tools/probe_mosaic.py            (on the TPU)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import numpy as np


def run_probe(name, fn):
    try:
        out = fn()
        print(f"PROBE {name}: OK {np.asarray(out).shape}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"PROBE {name}: FAIL {type(e).__name__} {msg}", flush=True)
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16

    # 1. merge (sublane, lane) keeping lane 128-aligned: (96,8,256)->(96,2048)
    def p_merge_minor():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(96, 8 * 256)

        x = jnp.ones((96, 8, 256), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((96, 2048), dt)
        )(x)

    # 2. merge (major, sublane) keeping lane: (8,160,96)->(1280,96)
    def p_merge_major():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(8 * 160, 96)

        x = jnp.ones((8, 160, 96), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1280, 96), dt)
        )(x)

    # 3. DMA a row slab of a rank-3 HBM array with an UNALIGNED lane dim
    #    (full minor extents, lane=32): (slab=16,160,32) from (2,64,160,32)
    def p_dma_lane32():
        def k(x_hbm, o_ref, x_vmem, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, 16), :, :], x_vmem, sem
            )
            cp.start()
            cp.wait()
            o_ref[...] = x_vmem[...]

        x = jnp.ones((2, 64, 160, 32), dt)
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((16, 160, 32), dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            scratch_shapes=[pltpu.VMEM((16, 160, 32), dt),
                            pltpu.SemaphoreType.DMA],
        )(x)

    # 4. rank-3 dot_general (batch-free, rank-3 rhs)
    def p_rank3_dot():
        def k(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        a = jnp.ones((96, 96), dt)
        b = jnp.ones((96, 8, 256), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((96, 8, 256), dt)
        )(a, b)

    # 5. lane split at a 128 boundary: (8,4096)->(8,32,128)
    def p_split_128():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(8, 32, 128)

        x = jnp.ones((8, 4096), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 32, 128), dt)
        )(x)

    # 6. pad+slice arithmetic on the sublane dim of a rank-3 f32 value
    def p_pad_sublane():
        def k(x_ref, o_ref):
            y = x_ref[...].astype(jnp.float32)
            ypad = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
            o_ref[...] = (
                ypad[:, 0:160, 0:32] + ypad[:, 1:161, 32:64] + ypad[:, 2:162, 64:96]
            ).astype(o_ref.dtype)

        x = jnp.ones((8, 160, 96), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 160, 32), dt)
        )(x)

    # 7. the original failing cast, for the record: (80,5120)->(80,160,32)
    def p_split_32():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(80, 160, 32)

        x = jnp.ones((80, 5120), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((80, 160, 32), dt)
        )(x)

    # 8. transposed-lhs matmul: contract sublane dim of both: (96,256)x(96,96)
    def p_dot_tn():
        def k(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        a = jnp.ones((96, 256), dt)  # (K, M)
        b = jnp.ones((96, 96), dt)   # (K, N)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((256, 96), dt)
        )(a, b)

    # 9. lane-dim concat of three 32-lane pieces -> 96 lanes
    def p_lane_concat():
        def k(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = jnp.concatenate([x, x, x], axis=-1)

        x = jnp.ones((8, 160, 32), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 160, 96), dt)
        )(x)

    # 10. sublane slice+concat of a rank-3 with lane=Wp (the xcolT build)
    def p_sublane_shift_concat():
        def k(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = jnp.concatenate(
                [x[:, a : a + 14, :] for a in range(3)], axis=0
            )

        x = jnp.ones((32, 16, 256), dt)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((96, 14, 256), dt)
        )(x)

    for name, fn in [
        ("merge_minor_keep128", p_merge_minor),
        ("merge_major_sublane", p_merge_major),
        ("dma_lane32_fullextent", p_dma_lane32),
        ("rank3_dot", p_rank3_dot),
        ("split_at_128", p_split_128),
        ("pad_sublane_taps", p_pad_sublane),
        ("split_to_lane32", p_split_32),
        ("dot_transposed_lhs", p_dot_tn),
        ("lane_concat_32x3", p_lane_concat),
        ("sublane_shift_concat", p_sublane_shift_concat),
    ]:
        run_probe(name, fn)


if __name__ == "__main__":
    main()
