"""Compile-draw autotuning for the v5e's nondeterministic backend compiles.

Finding (round 2, tools/bench_epoch2d.py): compiling the BYTE-IDENTICAL
train-step jaxpr twice on this TPU toolchain can yield binaries differing
~45% in step time (Task002-2d DS dice+CE step: 124.5 vs 195.6 ms/iter), with
the slow draws also compiling up to 10x slower. The optimized HLO of fast
and slow binaries is identical — the variance lives in the backend's
post-HLO scheduling/layout passes. The persistent compilation cache then
pins whichever binary was drawn.

This module turns the lottery into a knob: compile K variants of the same
step that differ only by a dead runtime-scaled constant (numerically a
no-op at seed=0.0, but different HLO bytes, hence an independent backend
compile draw), time each, and keep the best. One-time cost of K compiles
(minutes each on the remote toolchain) before a multi-hour training run;
the compile cache makes the chosen draw persistent across processes.

The perturbation: `loss += jiggle * (k * 1e-30)` where `jiggle` is a runtime
scalar argument fed 0.0. XLA cannot fold `x * c` for floats (NaN/Inf
semantics), so the multiply survives into the HLO and reseeds the backend;
at runtime 0.0 * c == 0.0 exactly, so every draw computes bit-identical
results. Verified in tests/test_autotune.py.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence


def jiggle_term(jiggle, draw: int):
    """The dead perturbation term to add to a scalar loss: exact zero at
    runtime (jiggle=0.0) but distinct HLO bytes per draw index."""
    return jiggle * (float(draw) * 1e-30)


def autotune_step(
    make_step: Callable[[int], Callable],
    args_fn: Callable[[], Sequence],
    draws: int = 3,
    reps: int = 5,
    sync=None,
    verbose: bool = True,
) -> tuple[Callable, list[dict]]:
    """Compile `draws` seed-perturbed variants of a step and return the
    fastest plus the per-draw timing records.

    make_step(draw) -> a jittable/jitted callable (closing over jiggle_term
    with the given draw index). args_fn() -> fresh call args (the step may
    donate or mutate state, so args are rebuilt per draw). sync(out) should
    force execution of the output (default: utils.profiling.fetch_sync —
    jax.block_until_ready is unreliable on the axon backend).
    """
    if sync is None:
        from csof_tpu.utils.profiling import fetch_sync

        sync = fetch_sync
    records, best = [], None
    for k in range(draws):
        step = make_step(k)
        args = args_fn()
        t0 = time.perf_counter()
        out = step(*args)
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(*args)
        # One fetch AFTER the loop (per tools/_timing.py): device programs
        # execute in order on the single stream, so forcing the last rep's
        # output forces all of them, without paying the ~25 ms tunnel RTT
        # per rep that a per-rep sync adds to every record.
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        rec = {"draw": k, "sec_per_iter": dt, "compile_s": compile_s}
        records.append(rec)
        if verbose:
            print(f"[autotune] draw {k}: {dt*1e3:.1f} ms/iter (compile {compile_s:.0f}s)", flush=True)
        if best is None or dt < best[1]:
            best = (step, dt, k)
    if verbose:
        print(f"[autotune] picked draw {best[2]}: {best[1]*1e3:.1f} ms/iter", flush=True)
    return best[0], records
