"""Fold validation: predict every validation case, export, score.

Capability parity with the reference's `trainer.validate`
(ref: nnunet/training/network_training/nnUNetTrainerV2.py validate +
nnUNetTrainer.py:637 `predict_preprocessed_data_return_seg_and_softmax` +
aggregate_scores summary.json): sliding-window prediction of the fold's
validation split from preprocessed arrays, NIfTI export in original
geometry, per-case + mean metric JSON.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from csof_tpu.config.plans import Plans
from csof_tpu.data.dataset import do_split, load_case, load_dataset
from csof_tpu.evaluation.evaluator import evaluate_case
from csof_tpu.inference.export import save_segmentation_from_softmax
from csof_tpu.inference.predictor import PredictorConfig, SlidingWindowPredictor


def validate_fold(
    trainer,
    plans: Plans,
    preprocessed_dir: str | Path,
    fold: int,
    output_folder: str | Path,
    step_size: float = 0.5,
    do_mirroring: bool = True,
    splits_file: str | Path | None = None,
) -> dict:
    """trainer: an initialized/restored csof Trainer with a seg model."""
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    ds = load_dataset(preprocessed_dir)
    _, val_keys = do_split(list(ds), fold, splits_file=splits_file)
    sp = plans.fullres_stage()

    net, params = trainer.model, trainer.state.params

    def apply_fn(p, x):
        out = net.apply(p, x)
        return out[0] if isinstance(out, tuple) else out

    predictor = SlidingWindowPredictor(
        apply_fn,
        PredictorConfig(
            patch_size=tuple(sp.patch_size),
            num_classes=plans.num_classes_with_background,
            step_size=step_size,
            do_mirroring=do_mirroring,
        ),
    )

    all_scores = []
    for case in val_keys:
        data, props = load_case(ds[case])
        data = np.asarray(data)
        img, seg_gt = data[: plans.num_modalities], data[-1]
        if len(sp.patch_size) == 2:
            seg, softmax = predictor.predict_2d_stack(params, img)
        else:
            seg, softmax = predictor.predict(params, img)
        save_segmentation_from_softmax(softmax, output_folder / f"{case}.nii.gz", props)
        scores = evaluate_case(seg, np.maximum(seg_gt, 0), plans.all_classes, surface=True)
        scores["case"] = case
        all_scores.append(scores)

    mean = {}
    for c in plans.all_classes:
        key = str(int(c))
        metric_names = [m for m in all_scores[0][key]]
        mean[key] = {
            m: float(np.nanmean([
                s[key][m] for s in all_scores
                if np.isfinite(s[key][m])
            ] or [np.nan]))
            for m in metric_names
        }
    summary = {"all": all_scores, "mean": mean}
    (output_folder / "summary.json").write_text(json.dumps(summary, indent=2, default=float))
    return summary
