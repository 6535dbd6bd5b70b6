"""U-Net cascade: lowres predictions feed the fullres stage as extra inputs.

Capability parity with ref: nnunet/training/network_training/
nnUNetTrainerCascadeFullRes.py:289 + nnunet/training/cascade_stuff/
predict_next_stage.py:46: the 3d_lowres model predicts the training set, the
segmentations are resampled to the fullres grid and appended to the fullres
model's input as one-hot channels.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from csof_tpu.data.dataset import load_case
from csof_tpu.ops.resample import resize_segmentation


def predict_next_stage(
    predict_fn,
    dataset: dict[str, dict],
    out_dir: str | Path,
    target_shapes: dict[str, tuple[int, ...]] | None = None,
):
    """Run `predict_fn(data (c, *sp)) -> seg (*sp,)` on every case and save
    `<case>_segFromPrevStage.npy` resampled to the fullres per-case shape
    (ref: predict_next_stage.py:46-90)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for case, entry in dataset.items():
        data, props = load_case(entry)
        seg = np.asarray(predict_fn(np.asarray(data[:-1])))
        if target_shapes and case in target_shapes:
            seg = resize_segmentation(seg, target_shapes[case], order=1)
        np.save(out_dir / f"{case}_segFromPrevStage.npy", seg.astype(np.int8))
    return out_dir


def load_prev_stage_onehot(
    prev_dir: str | Path, case: str, num_classes: int
) -> np.ndarray | None:
    """(num_classes-1, *sp) one-hot of foreground classes from the previous
    stage (background channel dropped, matching the reference's extra-input
    convention at ref: nnUNetTrainerCascadeFullRes.py initialize)."""
    p = Path(prev_dir) / f"{case}_segFromPrevStage.npy"
    if not p.exists():
        return None
    seg = np.load(p)
    return np.stack([(seg == c).astype(np.float32) for c in range(1, num_classes)])


def concat_prev_stage(data: np.ndarray, onehot: np.ndarray | None) -> np.ndarray:
    """Append prev-stage channels to (c, *sp) case data (before the seg
    channel if present)."""
    if onehot is None:
        return data
    assert onehot.shape[1:] == data.shape[1:], (
        f"prev-stage shape {onehot.shape[1:]} != data shape {data.shape[1:]}"
    )
    return np.concatenate([data, onehot], axis=0)
