"""Dataset analysis: per-case geometry + foreground intensity statistics.

Capability parity with the reference's `DatasetAnalyzer`
(ref: nnunet/experiment_planning/DatasetAnalyzer.py:27-280 —
`analyze_dataset:225` collects sizes/spacings, per-class presence, and
foreground-intensity stats median/mean/sd/percentiles 0.5 & 99.5 at
`collect_intensity_properties:181`), writing `dataset_properties.pkl`.
"""

from __future__ import annotations

import pickle
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np


def analyze_case(npz_path: str | Path, pkl_path: str | Path, num_modalities: int):
    """Stats for one cropped case (data+seg stacked npz from
    csof_tpu.data.cropping)."""
    arr = np.load(npz_path)["data"]
    data, seg = arr[:num_modalities], arr[-1]
    with open(pkl_path, "rb") as f:
        props = pickle.load(f)
    fg_mask = seg > 0
    intensities = {}
    for c in range(num_modalities):
        vox = data[c][fg_mask]
        if vox.size == 0:
            vox = data[c].reshape(-1)
        # subsample for speed like the reference (10th voxel)
        vox = vox[::10] if vox.size > 10_000 else vox
        intensities[c] = {
            "median": float(np.median(vox)),
            "mean": float(np.mean(vox)),
            "sd": float(np.std(vox)),
            "mn": float(np.min(vox)),
            "mx": float(np.max(vox)),
            "percentile_99_5": float(np.percentile(vox, 99.5)),
            "percentile_00_5": float(np.percentile(vox, 0.5)),
        }
    classes = sorted(int(c) for c in np.unique(seg) if c > 0)
    return {
        "size": tuple(int(s) for s in data.shape[1:]),
        "spacing": tuple(float(s) for s in props["original_spacing"]),
        "classes": classes,
        "size_reduction": float(
            np.prod(data.shape[1:]) / max(np.prod(props["original_size_of_raw_data"]), 1)
        ),
        "intensities": intensities,
    }


def analyze_dataset(
    cropped_dir: str | Path, num_modalities: int, num_workers: int = 4
) -> dict:
    """Aggregate stats over all cases in a cropped-data folder; writes
    `dataset_properties.pkl` next to the data (ref: DatasetAnalyzer.py:225)."""
    cropped_dir = Path(cropped_dir)
    cases = sorted(p.stem for p in cropped_dir.glob("*.npz"))
    assert cases, f"no cropped cases in {cropped_dir}"
    jobs = [(cropped_dir / f"{c}.npz", cropped_dir / f"{c}.pkl", num_modalities) for c in cases]
    if num_workers <= 1:
        per_case = [analyze_case(*j) for j in jobs]
    else:
        with ProcessPoolExecutor(max_workers=num_workers) as ex:
            per_case = list(ex.map(analyze_case, *zip(*jobs)))

    all_sizes = [p["size"] for p in per_case]
    all_spacings = [p["spacing"] for p in per_case]
    all_classes = sorted({c for p in per_case for c in p["classes"]})
    # pooled foreground intensity stats per modality
    intensity_props = {}
    for c in range(num_modalities):
        stats = [p["intensities"][c] for p in per_case]
        intensity_props[c] = {
            "median": float(np.median([s["median"] for s in stats])),
            "mean": float(np.mean([s["mean"] for s in stats])),
            "sd": float(np.mean([s["sd"] for s in stats])),
            "mn": float(np.min([s["mn"] for s in stats])),
            "mx": float(np.max([s["mx"] for s in stats])),
            "percentile_99_5": float(np.mean([s["percentile_99_5"] for s in stats])),
            "percentile_00_5": float(np.mean([s["percentile_00_5"] for s in stats])),
        }

    properties = {
        "all_sizes": all_sizes,
        "all_spacings": all_spacings,
        "all_classes": all_classes,
        "intensityproperties": intensity_props,
        "size_reductions": {c: p["size_reduction"] for c, p in zip(cases, per_case)},
        "case_identifiers": cases,
    }
    with open(cropped_dir / "dataset_properties.pkl", "wb") as f:
        pickle.dump(properties, f)
    return properties
