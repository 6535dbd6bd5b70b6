"""Perf exploration on the real TPU: throughput vs batch/dtype/components."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def time_config(name, cfg_kwargs, batch=4, t=12, hw=128, reps=5):
    import jax
    import jax.numpy as jnp

    from csof_tpu.config.experiment import SegFlowModelConfig
    from csof_tpu.models.segflow import SegFlow

    cfg = SegFlowModelConfig(**cfg_kwargs)
    model = SegFlow(cfg=cfg, num_classes=4)
    rng = np.random.RandomState(0)
    videos = jnp.asarray(rng.rand(batch, t, hw, hw, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), videos[0])

    @jax.jit
    def forward(videos):
        out = jax.vmap(lambda v: model.apply(params, v))(videos)
        return out["seg_logits"], out["cum_flow"]

    out = forward(videos)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = forward(videos)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch * t * reps / dt
    print(json.dumps({"name": name, "batch": batch, "fps": round(fps, 1)}), flush=True)
    return fps


SWEEPS = {
    "default": [
        ("base_b4", {}, dict(batch=4)),
        ("base_b16", {}, dict(batch=16)),
        ("f32_b4", {"dtype": "float32"}, dict(batch=4)),
        ("no_costvol_b4", {"use_cost_volume": False}, dict(batch=4)),
        ("no_gru_b4", {"use_gru": False}, dict(batch=4)),
    ],
    # B>=8 HBM-regression isolation (docs/BENCHMARKS.md batch-scaling row)
    "batch": [
        ("base_b2", {}, dict(batch=2)),
        ("base_b4", {}, dict(batch=4)),
        ("base_b8", {}, dict(batch=8)),
        ("base_b16", {}, dict(batch=16)),
        ("no_costvol_b8", {"use_cost_volume": False}, dict(batch=8)),
        ("no_gru_b8", {"use_gru": False}, dict(batch=8)),
    ],
}

if __name__ == "__main__":
    for name, cfg_kwargs, kw in SWEEPS[sys.argv[1] if len(sys.argv) > 1 else "default"]:
        time_config(name, cfg_kwargs, **kw)


def corr_impl_sweep():
    """Compare corr implementations at the SegFlow level (set env before jax init)."""
    import os

    for impl in ("jnp", "einsum"):
        os.environ["CSOF_CORR_IMPL"] = impl
        time_config(f"corr_{impl}_b4", {}, batch=4)
        time_config(f"corr_{impl}_b16", {}, batch=16)
