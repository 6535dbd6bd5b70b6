"""Perf exploration on the real TPU: throughput vs batch/dtype/components."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def time_config(name, cfg_kwargs, batch=4, t=12, hw=128, reps=5, draws=1, ablate=""):
    import os

    os.environ["CSOF_SEGFLOW_ABLATE"] = ablate  # trace-time diagnostic hook

    import jax
    import jax.numpy as jnp

    from csof_tpu.config.experiment import SegFlowModelConfig
    from csof_tpu.models.segflow import SegFlow
    from csof_tpu.utils.autotune import jiggle_term

    cfg = SegFlowModelConfig(**cfg_kwargs)
    model = SegFlow(cfg=cfg, num_classes=4)
    rng = np.random.RandomState(0)
    videos = jnp.asarray(rng.rand(batch, t, hw, hw, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), videos[0])
    zero = jnp.float32(0.0)

    def make_forward(k):
        @jax.jit
        def forward(videos, rep, jiggle):
            out = jax.vmap(lambda v: model.apply(params, v))(videos)
            # state-threaded, fetch-synchronized timing (tools/_timing.py):
            # block_until_ready is unreliable on the axon backend
            sign = 1.0 - 2.0 * (rep % 2).astype(jnp.float32)
            videos = videos * (1.0 + 2.0**-7 * sign)
            return videos, rep + 1, out["seg_logits"] + jiggle_term(jiggle, k), out["cum_flow"]

        return forward

    per_draw = []
    for k in range(draws):
        forward = make_forward(k)
        v, r = videos, jnp.int32(0)
        v, r, seg, flow = forward(v, r, zero)
        np.asarray(seg[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            v, r, seg, flow = forward(v, r, zero)
        np.asarray(seg[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        per_draw.append(batch * t * reps / dt)
    fps = max(per_draw)
    print(
        json.dumps(
            {"name": name, "batch": batch, "fps": round(fps, 1),
             "draw_fps": [round(f, 1) for f in per_draw]}
        ),
        flush=True,
    )
    return fps


SWEEPS = {
    # round-5 critical path: the corr+fuse Pallas megakernel (fused_cm,
    # ops/pallas/skipfuse.py) vs the round-4 serving pick (concat_cm),
    # same-day head-to-head at the serving config
    "r5fuse": [
        ("cm_b8", {"scan_unroll": 12, "corr_fuse": "concat_cm"},
         dict(batch=8, draws=3)),
        ("fused_b8", {"scan_unroll": 12, "corr_fuse": "fused_cm"},
         dict(batch=8, draws=3)),
    ],
    # single-draw first look (fused compiles are ~20 min each on the
    # remote helper; the 3-draw head-to-head comes after it's worth it)
    "r5fused1": [
        ("fused_b8", {"scan_unroll": 12, "corr_fuse": "fused_cm"},
         dict(batch=8, draws=1, reps=10)),
    ],
    # megakernel batch scaling (the per-op floor amortizes differently)
    "r5fuse_batch": [
        ("fused_b8", {"scan_unroll": 12, "corr_fuse": "fused_cm"},
         dict(batch=8, draws=2)),
        ("fused_b16", {"scan_unroll": 12, "corr_fuse": "fused_cm"},
         dict(batch=16, draws=2)),
    ],
    "default": [
        ("base_b4", {}, dict(batch=4)),
        ("base_b16", {}, dict(batch=16)),
        ("f32_b4", {"dtype": "float32"}, dict(batch=4)),
        ("no_costvol_b4", {"use_cost_volume": False}, dict(batch=4)),
        ("no_gru_b4", {"use_gru": False}, dict(batch=4)),
    ],
    # B>=8 HBM-regression isolation (docs/BENCHMARKS.md batch-scaling row)
    "batch": [
        ("base_b4", {}, dict(batch=4, draws=2)),
        ("base_b8", {}, dict(batch=8, draws=2)),
        ("base_b16", {}, dict(batch=16, draws=2)),
        ("base_b32", {}, dict(batch=32, draws=2)),
    ],
    # round-3 scan findings: attention bf16 softmax + scan unroll
    "scanperf": [
        ("base_b8", {}, dict(batch=8, draws=2)),
        ("unroll4_b8", {"scan_unroll": 4}, dict(batch=8, draws=2)),
        ("unroll12_b8", {"scan_unroll": 12}, dict(batch=8, draws=2)),
        ("unroll12_b16", {"scan_unroll": 12}, dict(batch=16, draws=2)),
    ],
    # scan_unroll > T means a plain Python loop over frames (no lax.scan op
    # at all) — measured SLOWER than the fully-unrolled scan body (1361 vs
    # 1484 f/s at B=8), kept for the record
    "unrollloop": [
        ("loop_b8", {"scan_unroll": 99}, dict(batch=8, draws=3)),
        ("loop_b16", {"scan_unroll": 99}, dict(batch=16, draws=3)),
    ],
    # time attribution at the round-3 serving config (B=8, unrolled body)
    "isolate12": [
        ("base", {"scan_unroll": 12}, dict(batch=8, draws=2)),
        ("no_warp", {"scan_unroll": 12}, dict(batch=8, draws=2, ablate="warp")),
        ("no_attn", {"scan_unroll": 12}, dict(batch=8, draws=2, ablate="attn")),
        ("no_menc", {"scan_unroll": 12}, dict(batch=8, draws=2, ablate="menc")),
        ("no_flowdec", {"scan_unroll": 12}, dict(batch=8, draws=2, ablate="flowdec")),
        ("no_costvol", {"scan_unroll": 12, "use_cost_volume": False}, dict(batch=8, draws=2)),
        ("no_gru", {"scan_unroll": 12, "use_gru": False}, dict(batch=8, draws=2)),
    ],
    # corr glue-ectomy at the serving config: split fuse keeps the corr
    # channel-major from kernel to NCHW conv (no output transpose), and
    # the q_cm hoist moved the query transposes out of the loop
    "gluecut": [
        ("concat_b8", {"scan_unroll": 12, "corr_fuse": "concat"}, dict(batch=8, draws=3)),
        ("splitcm_b8", {"scan_unroll": 12, "corr_fuse": "split"}, dict(batch=8, draws=3)),
    ],
    # round-4 serving pick: the pending q_cm glue-cut (split keeps corr
    # channel-major kernel->NCHW conv, no per-step transpose) and the
    # fuse_q_hoist (conv_q once, T-batched, outside the scan) — exact same
    # math as concat in all three rows
    "r4serve": [
        ("concat_b8", {"scan_unroll": 12, "corr_fuse": "concat"}, dict(batch=8, draws=3)),
        ("split_b8", {"scan_unroll": 12, "corr_fuse": "split"}, dict(batch=8, draws=3)),
        ("split_qhoist_b8",
         {"scan_unroll": 12, "corr_fuse": "split", "fuse_q_hoist": True},
         dict(batch=8, draws=3)),
    ],
    # round-4 serving pick, stage 2: the pair-batched attention bottleneck
    # (attn_fused) on top of the r4serve winner — exact same math rows
    "r4serve2": [
        ("concat_attnf_b8",
         {"scan_unroll": 12, "corr_fuse": "concat", "attn_fused": True},
         dict(batch=8, draws=3)),
        ("split_qhoist_attnf_b8",
         {"scan_unroll": 12, "corr_fuse": "split", "fuse_q_hoist": True,
          "attn_fused": True},
         dict(batch=8, draws=3)),
    ],
    # round-4 serving pick, stage 3: channel-major concat (concat_cm) —
    # exact same math AND param tree as concat, but the concat consumes the
    # hoisted q_cm skips + one shared per-level m transpose + the kernel's
    # native channel-major corr, feeding an NCHW fuse conv: no corr output
    # transpose and no lane padding of the odd concat width
    "r4serve3": [
        ("concat_b8", {"scan_unroll": 12, "corr_fuse": "concat"}, dict(batch=8, draws=3)),
        ("concat_cm_b8", {"scan_unroll": 12, "corr_fuse": "concat_cm"}, dict(batch=8, draws=3)),
    ],
    # round-4 serving pick, stage 4: the while1 temporal body (full
    # prime+unrolled loop inside ONE length-1 scan trip — while-op program
    # form + frame-0 dead-work elimination) on top of the concat_cm winner
    "r4serve4": [
        ("cm_b8", {"scan_unroll": 12, "corr_fuse": "concat_cm"},
         dict(batch=8, draws=3)),
        ("cm_while1_b8",
         {"scan_unroll": 12, "corr_fuse": "concat_cm", "scan_while1": True},
         dict(batch=8, draws=3)),
    ],
    # decoder upsample mode at the serving config: the reference-accurate
    # PatchExpand (matmul ConvTranspose+GN+GELU) vs bilinear resize
    "decups": [
        ("expand_b8", {"scan_unroll": 12, "dec_upsample": "expand"}, dict(batch=8, draws=3)),
        ("linear_b8", {"scan_unroll": 12, "dec_upsample": "linear"}, dict(batch=8, draws=3)),
    ],
    # pick bench.py's serving config: fully-unrolled scan body across batches
    "servepick": [
        ("unroll12_b8", {"scan_unroll": 12}, dict(batch=8, draws=4)),
        ("unroll12_b12", {"scan_unroll": 12}, dict(batch=12, draws=3)),
        ("unroll12_b16", {"scan_unroll": 12}, dict(batch=16, draws=3)),
        ("unroll12_b24", {"scan_unroll": 12}, dict(batch=24, draws=3)),
    ],
    # per-component time attribution inside the scan (CSOF_SEGFLOW_ABLATE
    # diagnostic hook): each row removes ONE recurrent-path component
    "isolate": [
        ("base_b8", {}, dict(batch=8, draws=2)),
        ("no_warp_b8", {}, dict(batch=8, draws=2, ablate="warp")),
        ("no_attn_b8", {}, dict(batch=8, draws=2, ablate="attn")),
        ("no_menc_b8", {}, dict(batch=8, draws=2, ablate="menc")),
        ("no_flowdec_b8", {}, dict(batch=8, draws=2, ablate="flowdec")),
        ("no_gru_b8", {"use_gru": False}, dict(batch=8, draws=2)),
    ],
    # corr-fuse restructure ablation (VERDICT r2 item 2): isolate the
    # lane-padded concat cost from the corr-kernel cost and the conv-width
    # cost at the bench geometry
    "fuse": [
        ("fuse_concat_b8", {"corr_fuse": "concat"}, dict(batch=8, draws=2)),
        ("fuse_split_b8", {"corr_fuse": "split"}, dict(batch=8, draws=2)),
        ("fuse_project_b8", {"corr_fuse": "project"}, dict(batch=8, draws=2)),
        ("fuse_mean1_b8", {"corr_fuse": "mean1"}, dict(batch=8, draws=2)),
        ("no_costvol_b8", {"use_cost_volume": False}, dict(batch=8, draws=2)),
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
