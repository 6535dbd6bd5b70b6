"""Connected-component postprocessing.

Capability parity with ref: nnunet/postprocessing/connected_components.py:
49-830 — `remove_all_but_largest_connected_component:49` and
`determine_postprocessing:123` (decide per class vs foreground-union whether
keeping only the largest component improves cross-val Dice; persist the
decision to postprocessing.json and apply it at inference).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from scipy.ndimage import label as cc_label

from csof_tpu.evaluation.metrics import dice


def remove_all_but_largest_component(
    seg: np.ndarray, for_which_classes, volume_per_voxel: float = 1.0, minimum_valid_object_size=None
):
    """for_which_classes: list of class ids or tuples (joint foreground)
    (ref: connected_components.py:49-120)."""
    seg = seg.copy()
    largest_removed = {}
    kept_size = {}
    for c in for_which_classes:
        if isinstance(c, (list, tuple)):
            mask = np.isin(seg, list(c))
        else:
            mask = seg == c
        labels, n = cc_label(mask)
        if n <= 1:
            continue
        sizes = {i: (labels == i).sum() * volume_per_voxel for i in range(1, n + 1)}
        biggest = max(sizes, key=sizes.get)
        kept_size[str(c)] = sizes[biggest]
        removed = 0.0
        for i, sz in sizes.items():
            if i == biggest:
                continue
            min_sz = None
            if minimum_valid_object_size is not None:
                min_sz = minimum_valid_object_size.get(str(c))
            if min_sz is None or sz < min_sz:
                seg[(labels == i) & mask] = 0
                removed = max(removed, sz)
        largest_removed[str(c)] = removed
    return seg, largest_removed, kept_size


def determine_postprocessing(
    pred_gt_pairs: list[tuple[np.ndarray, np.ndarray]],
    classes,
    output_file: str | Path | None = None,
) -> dict:
    """Grid-search whether keep-largest-CC (foreground-union first, then per
    class) improves mean Dice over the validation pairs
    (ref: connected_components.py:123-450, simplified to in-memory arrays).
    Returns the decision dict {'for_which_classes': [...]}.
    """
    classes = [int(c) for c in classes if c > 0]

    def mean_dice(preds):
        scores = []
        for p, g in zip(preds, (g for _, g in pred_gt_pairs)):
            for c in classes:
                d = dice(p == c, g == c)
                if not np.isnan(d):
                    scores.append(d)
        return float(np.mean(scores)) if scores else 0.0

    preds = [p for p, _ in pred_gt_pairs]
    base = mean_dice(preds)

    decisions = []
    # 1) all foreground as one region
    fg_processed = [
        remove_all_but_largest_component(p, [tuple(classes)])[0] for p in preds
    ]
    if mean_dice(fg_processed) > base:
        decisions.append(tuple(classes))
        preds, base = fg_processed, mean_dice(fg_processed)
    # 2) per class on top
    for c in classes:
        cand = [remove_all_but_largest_component(p, [c])[0] for p in preds]
        if mean_dice(cand) > base:
            decisions.append(c)
            preds, base = cand, mean_dice(cand)

    result = {
        "for_which_classes": [list(d) if isinstance(d, tuple) else d for d in decisions],
        "dice_after": base,
    }
    if output_file:
        Path(output_file).write_text(json.dumps(result, indent=2))
    return result


def apply_postprocessing(seg: np.ndarray, decision: dict) -> np.ndarray:
    fwc = [tuple(d) if isinstance(d, list) else d for d in decision.get("for_which_classes", [])]
    if not fwc:
        return seg
    out, _, _ = remove_all_but_largest_component(seg, fwc)
    return out


def load_postprocessing(path: str | Path) -> dict:
    return json.loads(Path(path).read_text())
