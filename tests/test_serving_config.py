"""The CLI's served config must equal bench.py's measured config.

Round 4 shipped the driver number at corr_fuse=concat_cm while the CLI
served concat (VERDICT r4 Missing #3) — the drift crept in because nothing
asserted the two configs match. csof_tpu/inference/serving.py is now the
single source of truth; these tests pin both consumers to it.
"""

import dataclasses

import numpy as np

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.inference.serving import (
    SERVING_CORR_FUSE,
    apply_serving_config,
    serving_kwargs,
)


def _effective_unroll(cfg: SegFlowModelConfig, t: int) -> int:
    """Mirror models/segflow.py's temporal-path dispatch: the effective
    unroll of the nn.scan body (t == fully unrolled)."""
    if cfg.scan_unroll > t:  # Python-loop path: straight-line, no scan
        return t
    return t if cfg.scan_unroll == -1 else min(cfg.scan_unroll, t)


def test_cli_serving_config_equals_bench_config():
    """apply_serving_config (the CLI path) and serving_kwargs (the bench
    path) must resolve a default-trained checkpoint to the same serving
    fields, for any cine length."""
    trained = SegFlowModelConfig()  # training default (corr_fuse=concat)
    for t in (6, 12, 25):
        cli_cfg = apply_serving_config(trained, t=None)  # CLI: T unknown
        bench_cfg = SegFlowModelConfig(**serving_kwargs(t))
        assert cli_cfg.corr_fuse == bench_cfg.corr_fuse == "fused_cm"
        assert _effective_unroll(cli_cfg, t) == _effective_unroll(bench_cfg, t) == t
        # everything else untouched by the remap
        for f in dataclasses.fields(trained):
            if f.name in ("scan_unroll", "corr_fuse"):
                continue
            assert getattr(cli_cfg, f.name) == getattr(trained, f.name)


def test_bench_build_uses_serving_kwargs():
    """bench._build's model config must carry the serving_kwargs defaults
    (tiny geometry; runs the real build on CPU)."""
    import bench

    t = 3
    videos = np.zeros((2, t, 16, 16, 1), np.float32)
    model, params = bench._build(
        videos, t, out_encoder_dims=(8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(2, 2), corr_stride=(1, 1),
        dtype="float32",
    )
    for k, v in serving_kwargs(t).items():
        assert getattr(model.cfg, k) == v, k
    # explicit kw still beats the serving default (round-3 ADVICE contract)
    model2, _ = bench._build(
        videos, t, scan_unroll=1, corr_fuse="concat",
        out_encoder_dims=(8, 16), d_model=16, bottleneck_heads=2,
        dim_feedforward=32, corr_radius=(2, 2), corr_stride=(1, 1),
        dtype="float32",
    )
    assert model2.cfg.scan_unroll == 1 and model2.cfg.corr_fuse == "concat"


def test_serving_remap_is_param_compatible_only(monkeypatch):
    """Modes whose param trees differ from concat are never remapped, and
    the env opt-outs are honored."""
    monkeypatch.delenv("CSOF_INFER_UNROLL", raising=False)
    monkeypatch.delenv("CSOF_SERVE_FUSE", raising=False)
    for mode in ("split", "project", "mean1", "fused_cm"):
        cfg = SegFlowModelConfig(corr_fuse=mode)
        expect = SERVING_CORR_FUSE.get(mode, mode)
        assert apply_serving_config(cfg, t=12).corr_fuse == expect
    # never remap the param-INCOMPATIBLE modes
    for mode in ("split", "project", "mean1"):
        assert mode not in SERVING_CORR_FUSE

    monkeypatch.setenv("CSOF_SERVE_FUSE", "0")
    assert apply_serving_config(SegFlowModelConfig(), t=12).corr_fuse == "concat"
    monkeypatch.setenv("CSOF_INFER_UNROLL", "0")
    out = apply_serving_config(SegFlowModelConfig(), t=12)
    assert out.scan_unroll == SegFlowModelConfig().scan_unroll
