"""Profiling/throughput utilities.

Capability parity with the reference's perf tooling (SURVEY.md §5):
`get_throughput` (ref: nnunet/training/network_training/nnMTLTrainerV2.py:
951-977 — warmup + N timed reps FPS + GFLOPs) and the throughput CLI
(ref: nnunet/throughput.py:1-40), plus what the reference lacked: real
`jax.profiler` traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """jax.profiler trace context; view with tensorboard --logdir."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def estimate_flops(fn, *args) -> float | None:
    """Analyzed FLOP estimate from XLA's cost analysis (replaces fvcore,
    ref: nnMTLTrainerV2.py:963)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def fetch_sync(tree) -> None:
    """Host-fetch one small element of `tree` — the only reliable
    synchronization on the remote axon backend, where block_until_ready
    sometimes returns before execution finishes (measured; tools/_timing.py
    has the full story). Real bytes cannot be returned early, and an XLA
    executable's outputs materialize together."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
            return


def get_throughput(
    fn, args, frames_per_call: int, warmup: int = 2, reps: int = 20
) -> dict:
    """Steady-state frames/sec of a jitted callable
    (protocol of ref: nnMTLTrainerV2.py:951-977, device-agnostic timing via
    host-fetch sync instead of CUDA events).

    Reps are chained through an output accumulator so each rep's result is
    consumed downstream, and the loop is closed with a host fetch — the
    honest-timing pattern for the axon backend (see fetch_sync)."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    fetch_sync(out)

    def _chain(acc, out):
        if acc is None:
            return out
        return jax.tree_util.tree_map(
            lambda a, b: a + b if hasattr(a, "ndim") else a, acc, out
        )

    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = _chain(acc, jfn(*args))
    fetch_sync(acc)
    dt = time.perf_counter() - t0
    fps = frames_per_call * reps / dt
    flops = estimate_flops(fn, *args)
    return {
        "fps": fps,
        "sec_per_call": dt / reps,
        "gflops_per_call": (flops / 1e9) if flops else None,
        "device": str(jax.devices()[0]),
    }


class StepTimer:
    """Rolling per-step wall time tracker (epoch timing parity,
    ref: network_trainer.py:572)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self.times = self.times[-self.window :]
            self._t0 = None

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")
