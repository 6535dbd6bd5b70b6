"""Per-phase (ED/ES) result aggregation + CSV merging.

Capability parity with ref: nnunet/get_results_per_phase.py,
nnunet/compute_metrics.py (per-phase Dice/HD splits) and nnunet/merge_csv.py
(joining per-method CSVs for the paper tables).
"""

from __future__ import annotations

import csv
import json
import re
from pathlib import Path

import numpy as np
import pandas as pd


def phase_of_case(case: str, ed_es: dict[str, dict] | None = None) -> str | None:
    """Infer ED/ES phase from a case id like patient001_frame01 using the
    converter's ed/es table, or _ED/_ES suffixes."""
    if case.endswith("_ED"):
        return "ED"
    if case.endswith("_ES"):
        return "ES"
    m = re.match(r"(.+)_frame(\d+)$", case)
    if m and ed_es:
        pid, frame = m.group(1), int(m.group(2))
        info = ed_es.get(pid)
        if info:
            if frame == int(info["ed"]):
                return "ED"
            if frame == int(info["es"]):
                return "ES"
    return None


def results_per_phase(
    summary_file: str | Path, ed_es: dict[str, dict] | None = None,
    metric: str = "Dice",
) -> dict:
    """Split an evaluator summary.json into per-phase per-class means."""
    summary = json.loads(Path(summary_file).read_text())
    buckets: dict[str, dict[str, list[float]]] = {"ED": {}, "ES": {}, "all": {}}
    for case_entry in summary["all"]:
        name = Path(case_entry.get("test", case_entry.get("case", ""))).name
        name = name.replace(".nii.gz", "")
        phase = phase_of_case(name, ed_es)
        for label, metrics in case_entry.items():
            if not isinstance(metrics, dict) or metric not in metrics:
                continue
            v = metrics[metric]
            if v is None or not np.isfinite(v):
                continue
            buckets["all"].setdefault(label, []).append(v)
            if phase:
                buckets[phase].setdefault(label, []).append(v)
    return {
        ph: {label: float(np.mean(vals)) for label, vals in labels.items()}
        for ph, labels in buckets.items()
        if labels
    }


def merge_csvs(csv_files: list[str | Path], out_file: str | Path, key: str = "case") -> pd.DataFrame:
    """Outer-join CSVs on `key`, suffixing columns by file stem
    (ref: merge_csv.py)."""
    merged = None
    for f in csv_files:
        df = pd.read_csv(f)
        stem = Path(f).stem
        df = df.rename(columns={c: f"{c}_{stem}" for c in df.columns if c != key})
        merged = df if merged is None else merged.merge(df, on=key, how="outer")
    merged.to_csv(out_file, index=False)
    return merged
