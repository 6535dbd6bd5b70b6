"""RAFT serving sweep (round 5, VERDICT #8): apply the kernel-count
findings from the SegFlow work to the 12-iteration GRU loop.

At 224² inputs the update block runs at 28² 1/8-res geometry — every op
sits below the measured 75-90 us/kernel dispatch floor, the same
structure that bounded the SegFlow temporal scan. Levers measured here:
  - scan_unroll: rolled lax.scan body vs fully unrolled (XLA fuses
    across iterations; exact — parity-pinned in tests/test_raft.py)
  - batch: vmapped pair batching (amortizes the floor across pairs)

Timing: fetch-synchronized threaded state (tools/_timing.py rationale —
block_until_ready is unreliable on this backend).

Usage: python tools/bench_raft_sweep.py [case ...]   (on the TPU)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

CASES = {
    # name: (batch, scan_unroll)
    "b1_rolled": (1, 1),
    "b1_unroll12": (1, 12),
    "b8_rolled": (8, 1),
    "b8_unroll12": (8, 12),
    "b1_unroll4": (1, 4),
}


def bench(name, hw=224, reps=10):
    batch, unroll = CASES[name]
    import jax
    import jax.numpy as jnp

    from csof_tpu.config.experiment import RaftModelConfig
    from csof_tpu.models.raft import RAFT

    model = RAFT(RaftModelConfig(iters=12, scan_unroll=unroll))
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(batch, hw, hw, 1), jnp.float32)
    b = jnp.asarray(rng.rand(batch, hw, hw, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), a[0], b[0])

    @jax.jit
    def step(a, b, rep):
        flow = jax.vmap(lambda x, y: model.apply(params, x, y)[-1])(a, b)
        # thread state through the rep loop so the chain cannot be elided
        sign = 1.0 - 2.0 * (rep % 2).astype(jnp.float32)
        a = a * (1.0 + 2.0**-10 * sign)
        return a, rep + 1, flow

    r = jnp.int32(0)
    t0 = time.perf_counter()
    a, r, flow = step(a, b, r)
    np.asarray(flow[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        a, r, flow = step(a, b, r)
    np.asarray(flow[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "case": name,
        "ms": round(dt * 1e3, 2),
        "pairs_per_sec": round(batch / dt, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    for case in (sys.argv[1:] or list(CASES)):
        bench(case)
