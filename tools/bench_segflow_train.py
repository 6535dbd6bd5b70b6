"""SegFlow TRAIN-step throughput on the v5e (frames/s/chip while training).

The reference trains SegFlowGaussian at video_length 6 / batch 1 on a
V100-16GB (ref: video.yaml, jean_zay_script_middle_video.sh). We time the
full jitted train step (fwd + NCC/smoothness/seg losses + backward + AdamW)
at that geometry and at a TPU-friendly batched one.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bench(batch=4, t=6, hw=128, draws=1, scan_unroll=1):
    import jax
    import jax.numpy as jnp
    import optax

    from csof_tpu.config.experiment import ExperimentConfig, SegFlowModelConfig
    from csof_tpu.models.segflow import SegFlow
    from csof_tpu.training.trainer import make_segflow_loss

    cfg = ExperimentConfig(
        model="segflow", segflow=SegFlowModelConfig(scan_unroll=scan_unroll)
    )
    model = SegFlow(cfg=cfg.segflow, num_classes=4)
    loss_fn = make_segflow_loss(cfg, model)

    rng = np.random.RandomState(0)
    batch_d = {
        "video": jnp.asarray(rng.rand(batch, t, hw, hw, 1), jnp.float32),
        "seg": jnp.asarray(rng.randint(0, 4, (batch, t, hw, hw)), jnp.int32),
        "labeled_mask": jnp.ones((batch, t), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch_d["video"][0])
    tx = optax.chain(optax.clip_by_global_norm(12.0), optax.adamw(1e-4))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_fn(p, b), has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    t0 = time.perf_counter()
    params, opt, loss = step(params, opt, batch_d)
    float(np.asarray(loss))
    compile_s = time.perf_counter() - t0
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, loss = step(params, opt, batch_d)
    float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "config": f"segflow_train_b{batch}_t{t}_{hw}"
        + (f"_u{scan_unroll}" if scan_unroll > 1 else ""),
        "sec_per_step": round(dt, 4),
        "frames_per_sec": round(batch * t / dt, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    import os

    os.environ.setdefault("CSOF_CORR_IMPL", "pallas")
    import sys as _s

    if _s.argv[1:]:
        # e.g. "4:6" = batch 4, unroll 6 (fully-unrolled scan body)
        for a in _s.argv[1:]:
            b, _, u = a.partition(":")
            bench(batch=int(b), scan_unroll=int(u) if u else 1)
    else:
        bench(batch=1, t=6)   # the reference's published geometry
        bench(batch=8, t=6)   # TPU serving batch
