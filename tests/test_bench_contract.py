"""Driver-contract tests for bench.py.

The benchmark must NEVER exit with a raw traceback: a dead TPU tunnel
(round-3 BENCH_r03.json was `rc=1, "Unable to initialize backend"`) has to
degrade to one parseable JSON line with an `error` field, and the
serving-config compile-failure fallback must actually build (round-3 ADVICE:
the closure-based build() raised duplicate-kwarg TypeError on
`build(scan_unroll=1)`).
"""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_build_fallback_override_no_typeerror():
    """_build(videos, t, scan_unroll=1) must override the serving default."""
    bench = _load_bench()
    videos = jnp.asarray(np.random.RandomState(0).rand(2, 4, 16, 16, 1).astype(np.float32))
    model, params = bench._build(
        videos,
        4,
        scan_unroll=1,  # the fallback override that used to TypeError
        out_encoder_dims=(4, 8, 16),
        d_model=16,
        bottleneck_heads=2,
        dim_feedforward=32,
        corr_radius=(1, 1, 1),
        corr_stride=(1, 1, 1),
        dtype="float32",
        deep_supervision=False,
    )
    assert model.cfg.scan_unroll == 1
    out = model.apply(params, videos[0])
    assert out["seg_logits"].shape[0] == 4


def test_dead_backend_emits_json_error_line(monkeypatch, capsys):
    """First device contact failing must print one parseable JSON line."""
    bench = _load_bench()

    def boom(*a, **kw):
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    # bench.main() setdefaults CSOF_CORR_IMPL=pallas for the TPU run; pin it
    # first so the in-process call can't leak a non-interpret pallas default
    # into the rest of the CPU suite (monkeypatch restores on teardown)
    monkeypatch.setenv("CSOF_CORR_IMPL", "jnp")
    monkeypatch.setattr(jax.numpy, "asarray", boom)
    try:
        bench.main()
    finally:
        monkeypatch.undo()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[-1])
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert "backend unavailable" in rec["error"]
    assert rec["metric"].startswith("cine-MRI")
