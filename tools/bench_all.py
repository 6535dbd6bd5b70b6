"""Throughput across all five BASELINE.json configs (judge evidence).

Run on the TPU (no JAX_PLATFORMS override); prints one JSON line per config.
Protocol matches bench.py / the reference's get_throughput hook.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def _time(fn, args, frames, reps=10):
    """State-threaded, fetch-synchronized timing (tools/_timing.py): each
    rep's program consumes the previous rep's output, and the end-of-loop
    host fetch forces the whole chain to actually execute —
    jax.block_until_ready is unreliable on the axon backend. Inputs must be
    NONZERO so the probe keeps the outputs alive."""
    import jax
    import jax.numpy as jnp

    x0, *rest = args

    @jax.jit
    def step(x, k):
        out = fn(x, *rest)
        probe = sum(
            jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out)
        )
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        scale = (1.0 + 2.0**-7 * sign + probe * 1e-30).astype(x.dtype)
        return x * scale, k + 1

    from tools._timing import fetch

    st = (x0, jnp.int32(0))
    st = step(*st)
    fetch(st)
    t0 = time.perf_counter()
    for _ in range(reps):
        st = step(*st)
    fetch(st)
    return frames * reps / (time.perf_counter() - t0)


def bench_unet2d():
    import jax
    import jax.numpy as jnp

    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(num_classes=4, base_num_features=32, deep_supervision=False)
    x = jnp.asarray(np.random.RandomState(0).rand(16, 256, 256, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x[:1])
    fps = _time(lambda v: net.apply(params, v), (x,), frames=16)
    print(json.dumps({"config": "unet2d_256_b16", "fps": round(fps, 1)}), flush=True)


def bench_unet3d():
    import jax
    import jax.numpy as jnp

    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(
        num_classes=4, base_num_features=16,
        pool_kernel_sizes=((1, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2)),
        conv_kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        deep_supervision=False,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 160, 160, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x[:1])
    fps = _time(lambda v: net.apply(params, v), (x,), frames=2 * 16)  # slices/sec
    print(json.dumps({"config": "unet3d_16x160_b2", "fps_slices": round(fps, 1)}), flush=True)


def bench_raft():
    import jax
    import jax.numpy as jnp

    from csof_tpu.config.experiment import RaftModelConfig
    from csof_tpu.models.raft import RAFT

    model = RAFT(RaftModelConfig(iters=12))
    a = jnp.asarray(np.random.RandomState(0).rand(224, 224, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), a, a)
    fps = _time(lambda x, y: model.apply(params, x, y)[-1], (a, a), frames=1)
    print(json.dumps({"config": "raft_224_12iters", "pairs_per_sec": round(fps, 2)}), flush=True)


def bench_voxelmorph():
    import jax
    import jax.numpy as jnp

    from csof_tpu.models.voxelmorph import VoxelMorph

    model = VoxelMorph()
    m = jnp.asarray(np.random.RandomState(0).rand(16, 192, 192, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), m[:1], m[:1])
    fps = _time(lambda a, b: model.apply(params, a, b)["flow"], (m, m), frames=16)
    print(json.dumps({"config": "voxelmorph_192_b16", "pairs_per_sec": round(fps, 1)}), flush=True)


def bench_segflow():
    import bench

    bench.main()


if __name__ == "__main__":
    bench_unet2d()
    bench_unet3d()
    bench_voxelmorph()
    bench_raft()
    bench_segflow()
