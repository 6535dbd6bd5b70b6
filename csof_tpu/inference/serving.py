"""Single source of truth for the measured SegFlow serving configuration.

bench.py (the driver metric) and the product CLI (`csof_predict_flow`) must
serve the SAME model configuration — round 4 measured `corr_fuse=concat_cm`
+ a fully-unrolled temporal body as the fastest serving config
(docs/BENCHMARKS.md "concat_cm"), but the CLI kept serving `concat`, so the
driver number described a config no CLI command reproduced. Both callers now
draw their overrides from here, and tests/test_serving_config.py asserts
they can never drift again.

Only PARAM-COMPATIBLE remaps belong here: a checkpoint trained with the
source config must load and produce bit-identical math under the remapped
one (concat -> concat_cm is the exact same conv over the exact same
channel concat, just computed channel-major; scan_unroll never touches
params — the step module is name-pinned across temporal paths).

Ref counterpart: the reference's inference dispatch picks its serving path
in predict.py:320-353; it has no faster-but-equal remap layer because its
eager execution has no layout/compile degrees of freedom to exploit.
"""

from __future__ import annotations

import dataclasses
import os

#: corr_fuse remaps that are same-math + param-path-identical (see
#: models/segflow.py SkipFuse: fused_cm/concat_cm share ConvNormAct_0/
#: Conv_0 + GroupNorm_0 with concat; fused_cm differs only in bf16
#: accumulation order). Modes with different param trees
#: (split/project/mean1) are never remapped.
SERVING_CORR_FUSE = {"concat": "fused_cm", "concat_cm": "fused_cm"}


def serving_kwargs(t: int) -> dict:
    """SegFlowModelConfig overrides for the measured serving config.

    `scan_unroll == t` fully unrolls the temporal body (one while trip
    carrying the straight-line T-step program; docs/BENCHMARKS.md round 3:
    1459-1484 vs 1271 f/s rolled at B=8). `fused_cm` is the round-5
    corr+fuse Pallas megakernel (r5fuse sweep: 1738.0 vs concat_cm's
    1568.3 f/s same-day, +10.8%; ops/pallas/skipfuse.py). bench.py applies
    these as defaults for the driver measurement.
    """
    return {"scan_unroll": int(t), "corr_fuse": "fused_cm"}


def apply_serving_config(cfg, t: int | None = None):
    """Remap a restored SegFlowModelConfig onto the measured serving config.

    Applies only the param-compatible overrides from `serving_kwargs`:
    - scan_unroll -> full unroll (t, or -1 = "unroll whatever T arrives"
      when the cine length is not known up front). CSOF_INFER_UNROLL=0
      opts out (e.g. to bound compile time on very long cines).
    - corr_fuse -> concat_cm, ONLY when the trained mode has a
      param-compatible serving remap (SERVING_CORR_FUSE). CSOF_SERVE_FUSE=0
      opts out.

    Returns a new config (dataclasses.replace); input is not mutated.
    """
    kw: dict = {}
    if os.environ.get("CSOF_INFER_UNROLL", "1") != "0":
        kw["scan_unroll"] = -1 if t is None else int(t)
    if (
        os.environ.get("CSOF_SERVE_FUSE", "1") != "0"
        and cfg.corr_fuse in SERVING_CORR_FUSE
    ):
        kw["corr_fuse"] = SERVING_CORR_FUSE[cfg.corr_fuse]
    return dataclasses.replace(cfg, **kw) if kw else cfg
