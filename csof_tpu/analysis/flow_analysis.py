"""Folder-level flow/strain analysis on prediction trees.

Capability parity with the reference's analysis scripts:
- ref: nnunet/compute_jacobian.py:62-227 — per-case |mean J - 1| and
  %negative-J per structure (RV=1, MYO=2, LV=3) + flow-gradient stats,
  aggregated to json/csv,
- ref: nnunet/save_strain.py:38-80 — perimeter strain curves per patient,
- ref: nnunet/get_strain.py:63-174 — contour tracking error by warping GT
  contour points through accumulated flows,
- ref: nnunet/compute_SSIM.py — SSIM of registered vs target frames.

All array math runs on device (vmapped over depth x time); IO stays host.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from csof_tpu.evaluation.metrics import ssim
from csof_tpu.ops.jacobian import jacobian_determinant_batch
from csof_tpu.ops.strain import (
    contour_tracking_error,
    extract_contour_points,
    radial_strain_curve,
    strain_curves,
    track_contour,
)

STRUCTURES = {1: "RV", 2: "MYO", 3: "LV"}


def jacobian_report(
    flow: np.ndarray, seg: np.ndarray | None = None
) -> dict:
    """flow: (T, D, H, W, 2) backward flows; seg: (T, D, H, W) labels or None.

    Returns per-structure {abs_mean_j_minus_1, pct_negative_j} (global if no
    seg), matching ref: compute_jacobian.py:62-227 aggregation.
    """
    t, d = flow.shape[:2]
    flat = jnp.asarray(flow.reshape(t * d, *flow.shape[2:]))
    det = np.asarray(jacobian_determinant_batch(flat)).reshape(t, d, *flow.shape[2:4])

    def stats(mask):
        vals = det[mask]
        if vals.size == 0:
            return {"abs_mean_j_minus_1": float("nan"), "pct_negative_j": float("nan")}
        return {
            "abs_mean_j_minus_1": float(abs(vals.mean() - 1.0)),
            "pct_negative_j": float(100.0 * (vals < 0).mean()),
        }

    out = {"global": stats(np.ones_like(det, bool))}
    if seg is not None:
        for label, name in STRUCTURES.items():
            out[name] = stats(seg == label)
    return out


def strain_report(seg: np.ndarray) -> dict:
    """seg: (T, D, H, W) label sequence. Per-depth strain curves averaged
    over depth (ref: save_strain.py writes D x T curves)."""
    t, d = seg.shape[:2]
    rv, lv, radial = [], [], []
    for z in range(d):
        curves = strain_curves(jnp.asarray(seg[:, z]))
        rv.append(np.asarray(curves["rv"]))
        lv.append(np.asarray(curves["lv"]))
        # LV radial (wall-thickening) strain, the Sradial_LV_curve
        # counterpart (ref: compute_strain_curve_metric.py:30)
        radial.append(radial_strain_curve(seg[:, z]))
    return {
        "rv_strain_per_depth": np.stack(rv).tolist(),
        "lv_strain_per_depth": np.stack(lv).tolist(),
        "lv_radial_strain_per_depth": np.stack(radial).tolist(),
        "rv_strain_mean": np.stack(rv).mean(0).tolist(),
        "lv_strain_mean": np.stack(lv).mean(0).tolist(),
        "lv_radial_strain_mean": np.nanmean(np.stack(radial), axis=0).tolist(),
    }


def contour_error_report(
    flows: np.ndarray, gt_segs: np.ndarray, label: int = 3, max_points: int = 128
) -> dict:
    """Track frame-0 GT contours of `label` through cumulative flows and
    measure error against the per-frame GT contours
    (ref: get_strain.py:63-174 `from_ed_accumulation`).

    flows: (T, H, W, 2) cumulative backward flows for one depth slice;
    gt_segs: (T, H, W) labels for the same slice.
    """
    pts0 = extract_contour_points(gt_segs[0] == label, max_points)
    tracked = track_contour(jnp.asarray(pts0), jnp.asarray(flows))
    gt_pts = np.stack([extract_contour_points(gt_segs[t] == label, max_points) for t in range(len(gt_segs))])
    err = np.asarray(contour_tracking_error(tracked, jnp.asarray(gt_pts)))
    return {"per_frame_error": err.tolist(), "mean_error": float(err[1:].mean() if len(err) > 1 else err.mean())}


def ssim_report(registered: np.ndarray, target: np.ndarray) -> dict:
    """registered/target: (T, D, H, W); SSIM per frame vs the target
    (ED) frame (ref: compute_SSIM.py)."""
    t, d = registered.shape[:2]
    vals = [
        float(np.mean([ssim(registered[ti, z], target[ti, z]) for z in range(d)]))
        for ti in range(t)
    ]
    return {"per_frame_ssim": vals, "mean_ssim": float(np.mean(vals))}


def analyze_prediction_tree(
    root: str | Path, out_file: str | Path | None = None,
    gt_seg_dir: str | Path | None = None,
) -> dict:
    """Analyze a Flow/Registered/Segmentation prediction tree (the layout
    written by csof_tpu.inference.flow_predictor.predict_and_export_case).

    With `gt_seg_dir` (per-case GT label 4D NIfTIs), also computes the
    contour tracking error by advecting the frame-0 GT contour through the
    predicted flows (ref: get_strain.py / compute_contour_metrics*.py)."""
    from csof_tpu.utils.nifti import load_nifti

    root = Path(root)
    results = {}
    for flow_file in sorted((root / "Flow").glob("*.npz")):
        case = flow_file.stem
        flow = np.load(flow_file)["flow"]  # (2, T, D, H, W)
        flow = np.moveaxis(flow, 0, -1)
        seg_file = root / "Segmentation" / f"{case}.nii.gz"
        seg = load_nifti(seg_file).data_czyx if seg_file.exists() else None
        entry = {"jacobian": jacobian_report(flow, seg)}
        if seg is not None:
            entry["strain"] = strain_report(seg)
        if gt_seg_dir is not None:
            gt_file = Path(gt_seg_dir) / f"{case}.nii.gz"
            if gt_file.exists():
                gt = load_nifti(gt_file).data_czyx  # (T, D, H, W)
                mid = gt.shape[1] // 2
                entry["contour_tracking"] = {
                    name: contour_error_report(flow[:, mid], gt[:, mid], label=label)
                    for name, label in (("LV", 3), ("RV", 1))
                }
        results[case] = entry
    if out_file:
        Path(out_file).write_text(json.dumps(results, indent=2))
    return results


def export_strain_curves(report: dict, out_dir: str | Path) -> int:
    """Write one .npz of strain curves per case, in the Medis-export key
    convention `S{radial,circ}_{LV,RV}_curve` that the strain-curve metric
    CLI consumes (ref: save_strain.py:38-80 writes per-patient curves;
    compute_strain_curve_metric.py:22-38 reads these keys). Returns the
    number of cases written."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for case, entry in report.items():
        s = entry.get("strain")
        if not s:
            continue
        arrays = {}
        for src, dst in (
            ("lv_radial_strain_mean", "Sradial_LV_curve"),
            ("lv_strain_mean", "Scirc_LV_curve"),
            ("rv_strain_mean", "Scirc_RV_curve"),
        ):
            if src in s:
                arrays[dst] = np.asarray(s[src], np.float64)
        if arrays:
            np.savez(out_dir / f"{case}.npz", **arrays)
            n += 1
    return n


def write_strain_csv(report: dict, path: str | Path):
    """Flatten strain means to CSV (ref: merge_csv.py / compute_strain_*)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["case", "structure", "frame", "strain_pct"])
        for case, entry in report.items():
            s = entry.get("strain")
            if not s:
                continue
            for name in ("rv", "lv", "lv_radial"):
                key = f"{name}_strain_mean"
                if key not in s:
                    continue
                for t, v in enumerate(s[key]):
                    w.writerow([case, name.upper(), t, f"{v:.4f}"])
