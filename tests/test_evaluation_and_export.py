"""Metrics, postprocessing, export round-trips."""

import numpy as np
import pytest

from csof_tpu.evaluation.evaluator import aggregate_scores, evaluate_case
from csof_tpu.evaluation.metrics import (
    avg_symmetric_surface_distance,
    dice,
    hausdorff_distance,
    hausdorff_distance_95,
    jaccard,
    normalized_surface_dice,
    ssim,
)
from csof_tpu.evaluation.postprocessing import (
    apply_postprocessing,
    determine_postprocessing,
    remove_all_but_largest_component,
)
from csof_tpu.inference.export import save_flow_field, save_segmentation_from_softmax
from csof_tpu.utils.nifti import load_nifti


def test_dice_jaccard_golden():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True  # 16
    b[4:8, 4:8] = True  # 16, overlap 4
    assert dice(a, b) == pytest.approx(2 * 4 / 32)
    assert jaccard(a, b) == pytest.approx(4 / 28)
    assert dice(a, a) == 1.0


def test_hausdorff_translated_squares():
    a = np.zeros((32, 32), bool)
    b = np.zeros((32, 32), bool)
    a[8:16, 8:16] = True
    b[8:16, 12:20] = True  # shifted 4 in x
    assert hausdorff_distance(a, b) == pytest.approx(4.0)
    assert hausdorff_distance_95(a, b) <= 4.0
    assert 0 < avg_symmetric_surface_distance(a, b) <= 4.0
    # spacing scales distances
    assert hausdorff_distance(a, b, spacing=(1.0, 2.0)) == pytest.approx(8.0)


def _brute_force_nsd(a, b, threshold, spacing=None):
    """Independent NSD oracle: surfaces via erosion, distances via explicit
    pairwise mins over spacing-scaled surface coordinates (no EDT)."""
    from scipy.ndimage import binary_erosion, generate_binary_structure

    spacing = np.asarray(spacing if spacing is not None else (1.0,) * a.ndim)
    conn = generate_binary_structure(a.ndim, 1)

    def surf(m):
        return np.argwhere(m & ~binary_erosion(m, conn, border_value=0)) * spacing

    sa, sb = surf(a.astype(bool)), surf(b.astype(bool))
    d_ab = np.sqrt(((sa[:, None, :] - sb[None, :, :]) ** 2).sum(-1)).min(1)
    d_ba = np.sqrt(((sb[:, None, :] - sa[None, :, :]) ** 2).sum(-1)).min(1)
    tp_a = (d_ab <= threshold).mean()
    tp_b = (d_ba <= threshold).mean()
    fp = (d_ab > threshold).mean()
    fn = (d_ba > threshold).mean()
    return (tp_a + tp_b) / (tp_a + tp_b + fp + fn + 1e-8)


def test_normalized_surface_dice_golden():
    """ref: evaluation/surface_dice.py:20 (normalized_surface_dice) —
    symmetric tolerance-banded surface overlap, threshold in mm."""
    a = np.zeros((24, 24), np.uint8)
    b = np.zeros((24, 24), np.uint8)
    a[6:18, 6:18] = 1
    b[8:20, 7:19] = 1
    # identity -> 1; empty -> nan; monotone in threshold
    assert normalized_surface_dice(a, a, 1.0) == pytest.approx(1.0)
    assert np.isnan(normalized_surface_dice(a, np.zeros_like(a), 1.0))
    vals = [normalized_surface_dice(a, b, t) for t in (0.5, 1.0, 2.0, 4.0)]
    assert all(x <= y + 1e-12 for x, y in zip(vals, vals[1:]))
    # matches the brute-force oracle, with and without anisotropic spacing
    for t in (1.0, 2.0, 3.0):
        for sp in (None, (1.5, 0.8)):
            assert normalized_surface_dice(a, b, t, sp) == pytest.approx(
                _brute_force_nsd(a, b, t, sp), abs=1e-6
            )
    # 3D with spacing (the cardiac use case: thick z slices)
    a3 = np.zeros((6, 16, 16), np.uint8)
    b3 = np.zeros((6, 16, 16), np.uint8)
    a3[1:5, 4:12, 4:12] = 1
    b3[1:5, 5:13, 4:12] = 1
    sp3 = (5.0, 1.25, 1.25)
    assert normalized_surface_dice(a3, b3, 2.0, sp3) == pytest.approx(
        _brute_force_nsd(a3, b3, 2.0, sp3), abs=1e-6
    )


def test_evaluate_case_includes_nsd():
    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((16, 16), np.uint8)
    a[4:12, 4:12] = 1
    b[5:13, 4:12] = 1
    res = evaluate_case(a, b, labels=[1], spacing=(1.0, 1.0), nsd_thresholds=(1.0, 3.0))
    assert "Normalized Surface Dice @1mm" in res["1"]
    assert "Normalized Surface Dice @3mm" in res["1"]
    assert res["1"]["Normalized Surface Dice @3mm"] >= res["1"]["Normalized Surface Dice @1mm"]


def test_ssim_identical_and_noise():
    rng = np.random.RandomState(0)
    x = rng.rand(32, 32)
    assert ssim(x, x) == pytest.approx(1.0)
    assert ssim(x, rng.rand(32, 32)) < 0.5


def test_remove_all_but_largest_component():
    seg = np.zeros((20, 20), np.uint8)
    seg[2:10, 2:10] = 1  # big
    seg[15:17, 15:17] = 1  # small
    out, removed, kept = remove_all_but_largest_component(seg, [1])
    assert out[15, 15] == 0 and out[5, 5] == 1
    assert removed["1"] == 4


def test_determine_postprocessing_improves():
    gt = np.zeros((20, 20), np.uint8)
    gt[2:10, 2:10] = 1
    pred = gt.copy()
    pred[15:17, 15:17] = 1  # spurious island
    decision = determine_postprocessing([(pred, gt)], classes=[1])
    assert decision["for_which_classes"], "keep-largest should be selected"
    cleaned = apply_postprocessing(pred, decision)
    assert cleaned[15, 15] == 0


def test_export_roundtrip(tmp_path):
    # original 12x14x14 volume, cropped bbox [2:10, 3:13, 3:13] -> resampled to 8x20x20
    properties = {
        "original_size_of_raw_data": (12, 14, 14),
        "original_spacing": (5.0, 1.0, 1.0),
        "size_after_cropping": (8, 10, 10),
        "spacing_after_resampling": (5.0, 0.5, 0.5),
        "crop_bbox": [[2, 10], [3, 13], [3, 13]],
        "nifti_affine": np.diag([1.0, 1.0, 5.0, 1.0]),
    }
    softmax = np.zeros((2, 8, 20, 20), np.float32)
    softmax[0] = 1.0
    softmax[0, 2:6, 8:16, 8:16] = 0.1
    softmax[1, 2:6, 8:16, 8:16] = 0.9
    out = tmp_path / "case.nii.gz"
    save_segmentation_from_softmax(softmax, out, properties)
    img = load_nifti(out)
    seg = img.data_czyx
    assert seg.shape == (12, 14, 14)
    # fg block: resampled 20->10 maps [8:16]->[4:8], bbox offset +3 / +2
    assert seg[4 + 2, 7, 7] == 1
    assert seg[0, 0, 0] == 0


def test_flow_export_rescales(tmp_path):
    properties = {
        "original_size_of_raw_data": (4, 12, 12),
        "original_spacing": (5.0, 1.0, 1.0),
        "size_after_cropping": (4, 12, 12),
        "spacing_after_resampling": (5.0, 0.5, 0.5),
        "crop_bbox": [[0, 4], [0, 12], [0, 12]],
    }
    flow = np.ones((2, 4, 24, 24), np.float32)
    out = tmp_path / "flow.npz"
    save_flow_field(flow, out, properties)
    loaded = np.load(out)["flow"]
    assert loaded.shape == (2, 4, 12, 12)
    # displacement halves when the grid halves (24 -> 12)
    interior = loaded[:, 1:-1, 6:18, 6:18]
    np.testing.assert_allclose(interior, 0.5, atol=1e-2)


def test_aggregate_scores_json(tmp_path):
    from csof_tpu.utils.nifti import save_nifti

    gt = np.zeros((4, 10, 10), np.uint8)
    gt[:, 2:6, 2:6] = 1
    pred = gt.copy()
    pred[:, 2, 2] = 0
    save_nifti(gt, tmp_path / "gt.nii.gz")
    save_nifti(pred, tmp_path / "pred.nii.gz")
    res = aggregate_scores(
        [(tmp_path / "pred.nii.gz", tmp_path / "gt.nii.gz")],
        labels=[1],
        json_output_file=tmp_path / "summary.json",
    )
    assert (tmp_path / "summary.json").exists()
    assert 0.9 < res["mean"]["1"]["Dice"] < 1.0
