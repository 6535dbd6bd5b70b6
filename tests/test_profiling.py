"""Profiling/throughput utilities."""

import jax.numpy as jnp
import numpy as np

from csof_tpu.utils.profiling import StepTimer, estimate_flops, get_throughput


def test_get_throughput_and_flops():
    def fn(x):
        return x @ x

    x = jnp.ones((128, 128))
    res = get_throughput(fn, (x,), frames_per_call=1, warmup=1, reps=5)
    assert res["fps"] > 0
    flops = estimate_flops(fn, x)
    if flops is not None:  # matmul ~ 2*128^3
        assert 1e6 < flops < 1e8


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        t.start()
        t.stop()
    assert len(t.times) == 3
    assert np.isfinite(t.mean)
