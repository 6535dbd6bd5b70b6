"""SegFlow TRAIN-step attribution sweep on the v5e (round 5, VERDICT #4).

After the corr-backward v2 fix moved training from 87.6 to 234.7 f/s
(b=4, T=6, 128², rolled scan), the profile owner is unknown — the round-4
serving attribution does not transfer (serving runs fully unrolled with
the fused_cm megakernel; training runs the rolled scan with the XLA fuse
path, and the backward doubles every component's traffic).

Each case re-traces the full train step (fwd + NCC/smoothness/seg loss +
backward + AdamW) with one component ablated at trace time, in-process:
the CSOF_* env hooks and CSOF_SEGFLOW_ABLATE are read during tracing, so
setting them before the per-case jit is sufficient. Timing is the
fetch-synchronized threaded-state pattern (tools/_timing.py rationale:
block_until_ready is unreliable on this backend) — params/opt ride the
rep loop, one scalar fetch at the end.

Usage: python tools/bench_train_attrib.py [case ...]   (on the TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

CASES = {
    # name: (env overrides, SegFlowModelConfig kwargs, LossWeights kwargs)
    "base": ({}, {}, {}),
    # correlation kernel fwd+bwd cost (pallas -> jnp shifted-slice)
    "corr_jnp": ({"CSOF_CORR_IMPL": "jnp"}, {}, {}),
    # corr backward only (v2 pallas -> XLA transpose of the fwd)
    "corrbwd_jnp": ({"CSOF_CORR_BWD": "jnp"}, {}, {}),
    # component ablations (trace-time; changes math AND param tree — the
    # DELTA vs base is the attribution, absolute numbers are diagnostic)
    "no_warp": ({"CSOF_SEGFLOW_ABLATE": "warp"}, {}, {}),
    "no_attn": ({"CSOF_SEGFLOW_ABLATE": "attn"}, {}, {}),
    "no_menc": ({"CSOF_SEGFLOW_ABLATE": "menc"}, {}, {}),
    "no_flowdec": ({"CSOF_SEGFLOW_ABLATE": "flowdec"}, {}, {}),
    # corr fuse-conv width isolation: mean1 collapses corr to 1 channel so
    # the 81-ch fuse-conv slab (and its backward) drops out but the corr
    # kernel itself still runs
    "fuse_mean1": ({}, {"corr_fuse": "mean1"}, {}),
    # the serving winner under grad (param-compatible with concat)
    "fuse_concat_cm": ({}, {"corr_fuse": "concat_cm"}, {}),
    # loss-term costs (weights are trace-time Python floats -> XLA DCEs
    # the zeroed term's fwd AND bwd graphs)
    "no_ncc": ({}, {}, {"image_flow_global": 0.0}),
    "no_smooth": ({}, {}, {"regularization_xy": 0.0}),
    # optimizer/clip overhead
    "sgd_noclip": ({}, {}, {"_opt": "sgd"}),
}


def bench(name, batch=4, t=6, hw=128, reps=10):
    env, cfg_kw, loss_kw = CASES[name]
    for k in ("CSOF_CORR_IMPL", "CSOF_CORR_BWD", "CSOF_SEGFLOW_ABLATE"):
        os.environ.pop(k, None)
    os.environ["CSOF_CORR_IMPL"] = "pallas"
    os.environ.update(env)

    import jax
    import jax.numpy as jnp
    import optax

    from csof_tpu.config.experiment import (
        ExperimentConfig, LossWeights, SegFlowModelConfig,
    )
    from csof_tpu.models.segflow import SegFlow
    from csof_tpu.training.trainer import make_segflow_loss

    opt_kind = loss_kw.pop("_opt", "adamw")
    cfg = ExperimentConfig(
        model="segflow",
        segflow=SegFlowModelConfig(**cfg_kw),
        loss_weights=LossWeights(**loss_kw),
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
    if opt_kind == "sgd":
        tx = optax.sgd(1e-4, momentum=0.9)
    else:
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
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, loss = step(params, opt, batch_d)
    float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "case": name,
        "ms_per_step": round(dt * 1e3, 1),
        "frames_per_sec": round(batch * t / dt, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    for case in (sys.argv[1:] or list(CASES)):
        bench(case)
