"""Honest TPU timing for the axon remote backend.

Settled by direct probes (round 3, /tmp/probe_fetch.py; see the
axon-benchmark-elision memory note and docs/BENCHMARKS.md):

- `jax.block_until_ready` is UNRELIABLE over the axon tunnel: it sometimes
  returns before execution finishes (the same 1.1-TFLOP program read
  0.03 ms/rep or 70 ms/rep in different processes under block-based
  timing, and 71 ms/rep reproducibly under fetch-based timing).
- The only trustworthy synchronization is a HOST FETCH (np.asarray) of a
  value whose dataflow depends on the work being timed — the server cannot
  return real bytes early.
- Per-rep fetches add a ~25 ms tunnel round-trip each; fetch ONCE after the
  rep loop, on a state that was threaded through every rep.
- A null-step calibration (state thread + scalar fetch, no work) costs
  ~6.5 ms/rep at 314 MB threaded state — subtract when measuring
  single-digit-ms kernels.

Canonical pattern:

    state = step(*state)            # warmup / compile
    fetch(state)                    # drain warmup fully
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(*state)        # state must thread through every rep
    fetch(state)                    # forces execution of the whole chain
    dt = (time.perf_counter() - t0) / reps

where `fetch` pulls a SMALL leaf (scalar or tiny slice) of the final state
to the host. The step must return its inputs transformed (not passed
through unchanged) so each rep's output depends on the previous rep.
"""

from __future__ import annotations

import time


def fetch(tree) -> None:
    """Force full execution of everything `tree` depends on by pulling one
    small element to the host. np.asarray of real data cannot complete
    before the computation that produces it, and an XLA executable's
    outputs materialize together — so one element of one output forces the
    whole program (and, with state threading, the whole rep chain)."""
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
            return


def time_state(step, state, reps: int = 8) -> float:
    """Seconds per rep of a state-threading step, fetch-synchronized."""
    state = step(*state)
    fetch(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(*state)
    fetch(state)
    return (time.perf_counter() - t0) / reps
