"""Cardiac cine video dataset assembly for the flow models.

Builds the per-patient video dict consumed by
:class:`csof_tpu.data.loaders.VideoChunkLoader` from a converted task folder
(the `cine/` 4D NIfTIs + ED/ES numbers recorded by the ACDC converter and
the ED/ES ground-truth segmentations from labelsTr).

Capability parity with the reference's video data path
(ref: nnunet/training/dataloading/dataset_loading.py DataLoaderPreprocessed
reading per-frame npys + ed/es numbers from properties; ED/ES numbers
sourced from Info.cfg by the converter,
ref: nnunet/dataset_conversion/Task027_...py:23 `get_labeled_frame_nb`).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from csof_tpu.utils.nifti import load_nifti


def read_ed_es_csv(csv_file: str | Path) -> dict[str, dict]:
    """ED/ES numbers from a CSV with columns (patient, ed, es) — the source
    the reference uses for the Lib dataset
    (ref: nnunet/inference/predict.py:1196 `get_ed_es_indices` from CSV)."""
    import csv as _csv

    out: dict[str, dict] = {}
    with open(csv_file, newline="") as f:
        reader = _csv.DictReader(f)
        cols = {c.lower(): c for c in reader.fieldnames or []}
        for row in reader:
            pid = row[cols.get("patient", "patient")]
            out[pid] = {
                "ed": int(float(row[cols.get("ed", "ed")])),
                "es": int(float(row[cols.get("es", "es")])),
            }
    return out


def build_video_datasets(task_dir: str | Path, ed_es_csv: str | Path | None = None) -> dict[str, dict]:
    """task_dir: converted task folder with cine/, labelsTr/, dataset.json.

    Returns patient -> {"frames": (T, z, y, x) float32, "seg": (T, z, y, x)
    int16 with -1 on unlabeled frames (labels only at ED/ES), "ed": int,
    "es": int} (0-based frame indices).
    """
    task_dir = Path(task_dir)
    dj = json.loads((task_dir / "dataset.json").read_text())
    ed_es = dj.get("ed_es_numbers", {})
    if ed_es_csv is not None:
        ed_es = {**ed_es, **read_ed_es_csv(ed_es_csv)}
    videos: dict[str, dict] = {}
    for cine_file in sorted((task_dir / "cine").glob("*_4d.nii.gz")):
        pid = cine_file.name.replace("_4d.nii.gz", "")
        frames = load_nifti(cine_file).data_czyx.astype(np.float32)  # (T, z, y, x)
        info = ed_es.get(pid)
        if info is None:
            continue
        ed, es = int(info["ed"]) - 1, int(info["es"]) - 1
        seg = np.full(frames.shape, -1, np.int16)
        for fnum in (ed, es):
            gt = task_dir / "labelsTr" / f"{pid}_frame{fnum + 1:02d}.nii.gz"
            if gt.exists():
                seg[fnum] = load_nifti(gt).data_czyx.astype(np.int16)
        videos[pid] = {"frames": frames, "seg": seg, "ed": ed, "es": es}
    return videos


def put_ed_first(frames: np.ndarray, ed_idx: int, seg: np.ndarray | None = None):
    """Roll the time axis so the ED frame is frame 0 — flow inference anchors
    the cumulative field at frame 0
    (ref: nnunet/inference/predict.py:1165 `put_ed_first` +
    `get_ed_es_indices:1196`). Returns (frames, seg, inverse_roll) where
    rolling outputs by `inverse_roll` restores acquisition order."""
    ed_idx = int(ed_idx) % frames.shape[0]
    rolled = np.roll(frames, -ed_idx, axis=0)
    seg_rolled = np.roll(seg, -ed_idx, axis=0) if seg is not None else None
    return rolled, seg_rolled, ed_idx


def restore_frame_order(arr: np.ndarray, inverse_roll: int) -> np.ndarray:
    return np.roll(arr, inverse_roll, axis=0)


def split_videos(videos: dict[str, dict], fold: int, n_splits: int = 5, seed: int = 12345):
    from csof_tpu.data.dataset import do_split

    tr, va = do_split(sorted(videos), fold, n_splits=n_splits, seed=seed)
    return {k: videos[k] for k in tr}, {k: videos[k] for k in va}
