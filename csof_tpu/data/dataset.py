"""Preprocessed-dataset access: case dict, npz unpacking, 5-fold splits.

Capability parity with ref: nnunet/training/dataloading/dataset_loading.py:
`load_dataset:151` (lazy per-case dict), `unpack_dataset:120` (npz -> npy
memmap-able files), and the trainer's `do_split`
(ref: nnunet/training/network_training/network_trainer.py:160 — 5-fold
KFold, shuffle seed 12345, persisted splits file).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
from sklearn.model_selection import KFold


def load_dataset(folder: str | Path) -> dict[str, dict]:
    folder = Path(folder)
    dataset = {}
    for npz in sorted(folder.glob("*.npz")):
        case = npz.stem
        dataset[case] = {
            "data_file": npz,
            "npy_file": npz.with_suffix(".npy"),
            "properties_file": npz.with_name(f"{case}.pkl"),
        }
    return dataset


def unpack_dataset(folder: str | Path):
    """npz -> raw .npy so loaders can np.load(mmap_mode='r')
    (ref: dataset_loading.py:120)."""
    for npz in sorted(Path(folder).glob("*.npz")):
        npy = npz.with_suffix(".npy")
        if not npy.exists():
            np.save(npy, np.load(npz)["data"])


def load_case(entry: dict) -> tuple[np.ndarray, dict]:
    npy = entry.get("npy_file")
    if npy and Path(npy).exists():
        data = np.load(npy, mmap_mode="r")
    else:
        data = np.load(entry["data_file"])["data"]
    with open(entry["properties_file"], "rb") as f:
        props = pickle.load(f)
    return data, props


def do_split(
    case_ids: list[str], fold: int, n_splits: int = 5, seed: int = 12345,
    splits_file: str | Path | None = None,
) -> tuple[list[str], list[str]]:
    """Deterministic 5-fold split with persistence
    (ref: network_trainer.py:160-235 `do_split`). fold == 'all'/-1 trains on
    everything."""
    case_ids = sorted(case_ids)
    if fold in (-1, "all"):
        return case_ids, case_ids
    splits = None
    if splits_file and Path(splits_file).exists():
        with open(splits_file, "rb") as f:
            splits = pickle.load(f)
    if splits is None:
        n_splits = min(n_splits, len(case_ids))
        if n_splits < 2:
            return case_ids, case_ids
        kf = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
        splits = []
        for tr_idx, va_idx in kf.split(case_ids):
            splits.append(
                {"train": [case_ids[i] for i in tr_idx], "val": [case_ids[i] for i in va_idx]}
            )
        if splits_file:
            with open(splits_file, "wb") as f:
                pickle.dump(splits, f)
    s = splits[fold]
    return list(s["train"]), list(s["val"])
