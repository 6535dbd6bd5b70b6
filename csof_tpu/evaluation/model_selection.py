"""Model/configuration selection: pick the best config or ensemble.

Capability parity with ref: nnunet/evaluation/model_selection/
figure_out_what_to_submit.py + nnunet/inference/ensemble_predictions.py:26-98:
score every configuration (and every pairwise softmax ensemble) by mean
foreground Dice on validation predictions, determine postprocessing for the
winner, and emit the decision.
"""

from __future__ import annotations

import itertools
import json
from pathlib import Path

import numpy as np

from csof_tpu.evaluation.metrics import dice
from csof_tpu.evaluation.postprocessing import determine_postprocessing


def mean_fg_dice(pred_gt_pairs, classes) -> float:
    vals = []
    for p, g in pred_gt_pairs:
        for c in classes:
            d = dice(p == c, g == c)
            if not np.isnan(d):
                vals.append(d)
    return float(np.mean(vals)) if vals else 0.0


def ensemble_softmax(softmax_list):
    return [sum(s) / len(s) for s in zip(*softmax_list)]


def find_best_configuration(
    configs: dict[str, list[np.ndarray]],
    gts: list[np.ndarray],
    classes,
    output_file: str | Path | None = None,
    allow_ensembling: bool = True,
) -> dict:
    """configs: name -> list of per-case softmax arrays (C, *spatial) over the
    SAME validation cases; gts: per-case label arrays.

    Returns {"best": name, "scores": {...}, "postprocessing": {...}}.
    """
    classes = [int(c) for c in classes if c > 0]
    scores: dict[str, float] = {}
    seg_sets: dict[str, list[np.ndarray]] = {}

    for name, softmaxes in configs.items():
        segs = [s.argmax(0) for s in softmaxes]
        seg_sets[name] = segs
        scores[name] = mean_fg_dice(list(zip(segs, gts)), classes)

    if allow_ensembling and len(configs) > 1:
        for a, b in itertools.combinations(sorted(configs), 2):
            name = f"ensemble_{a}+{b}"
            ens = ensemble_softmax([configs[a], configs[b]])
            segs = [s.argmax(0) for s in ens]
            seg_sets[name] = segs
            scores[name] = mean_fg_dice(list(zip(segs, gts)), classes)

    best = max(scores, key=scores.get)
    pp = determine_postprocessing(list(zip(seg_sets[best], gts)), classes)
    result = {"best": best, "scores": scores, "postprocessing": pp}
    if output_file:
        Path(output_file).write_text(json.dumps(result, indent=2))
    return result
