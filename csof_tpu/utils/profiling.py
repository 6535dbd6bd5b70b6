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


def get_throughput(
    fn, args, frames_per_call: int, warmup: int = 2, reps: int = 20
) -> dict:
    """Steady-state frames/sec of a jitted callable
    (protocol of ref: nnMTLTrainerV2.py:951-977, device-agnostic timing via
    block_until_ready instead of CUDA events)."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
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
