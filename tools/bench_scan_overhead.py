"""Measure per-iteration overhead of lax.scan on the remote TPU backend.

The SegFlow scan path runs ~0.1 GFLOP per step but ~4 ms per step on chip —
if the while-loop iteration itself carries fixed overhead (remote dispatch,
sync, or compiler-inserted spills), unrolling the T=12 time loop would beat
scanning it. Three programs over identical math answer this:

  scan     lax.scan over T conv steps (the current SegFlow structure)
  unroll   the same T steps as straight-line XLA (scan(..., unroll=T))
  scan1    a scan whose body is a single cheap add (pure loop overhead)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tools._timing import fetch


def main(t=12, b=8, hw=128, c=32, reps=10):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, hw, hw, c), jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, c, c) * 0.05, jnp.bfloat16)

    def body(carry, _):
        y = jax.lax.conv_general_dilated(
            carry, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # keep magnitude bounded so the chain is numerically stable
        y = y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
        return y, ()

    def run(name, unroll):
        @jax.jit
        def step(x, k):
            out, _ = jax.lax.scan(body, x, None, length=t, unroll=unroll)
            # thread state so the end-of-loop fetch forces every rep
            sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
            return out * (1 + 2.0**-7 * sign).astype(out.dtype), k + 1

        st = (x, jnp.int32(0))
        st = step(*st)
        fetch(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = step(*st)
        fetch(st)
        ms = (time.perf_counter() - t0) / reps * 1e3
        flops = 2 * t * b * hw * hw * 9 * c * c
        print(json.dumps({"name": name, "ms": round(ms, 3),
                          "tflops": round(flops / (ms / 1e3) / 1e12, 2)}), flush=True)
        return ms

    def run_empty(name):
        def tiny(carry, _):
            return carry + 1.0, ()

        @jax.jit
        def step(s, k):
            out, _ = jax.lax.scan(tiny, s, None, length=t)
            sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
            return out * (1 + 2.0**-7 * sign), k + 1

        st = (jnp.float32(1.0), jnp.int32(0))
        st = step(*st)
        fetch(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = step(*st)
        fetch(st)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    run_empty("scan_empty_body")
    run("scan", unroll=1)
    run("unroll", unroll=t)


if __name__ == "__main__":
    main()
