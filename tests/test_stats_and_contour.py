"""Statistical tests + contour-tracking analysis wiring."""

import json

import numpy as np

from csof_tpu.analysis.stats import compare_methods, paired_tests


def test_paired_tests_detects_difference():
    rng = np.random.RandomState(0)
    a = rng.rand(30) + 0.5
    b = a - 0.2 + rng.randn(30) * 0.01
    res = paired_tests(a, b)
    assert res["wilcoxon_p"] < 0.01
    assert res["ttest_p"] < 0.01
    assert res["mean_diff"] > 0.15
    same = paired_tests(a, a)
    assert same["mean_diff"] == 0.0


def test_compare_methods():
    cases = [f"c{i}" for i in range(20)]
    rng = np.random.RandomState(1)
    base = {c: 0.8 + rng.randn() * 0.02 for c in cases}
    better = {c: base[c] + 0.05 for c in cases}
    res = compare_methods({"base": base, "better": better}, baseline="base")
    assert res["better"]["mean_diff"] > 0.04
    assert res["better"]["wilcoxon_p"] < 0.01


def test_contour_tracking_in_tree_analysis(tmp_path):
    from csof_tpu.analysis.flow_analysis import analyze_prediction_tree
    from csof_tpu.utils.nifti import save_nifti

    root = tmp_path / "tree"
    (root / "Flow").mkdir(parents=True)
    (root / "Segmentation").mkdir()
    t, d, h, w = 3, 2, 32, 32
    flow = np.zeros((2, t, d, h, w), np.float32)
    np.savez_compressed(root / "Flow" / "p1.npz", flow=flow)
    seg = np.zeros((t, d, h, w), np.uint8)
    seg[:, :, 10:20, 10:20] = 3
    save_nifti(seg, root / "Segmentation" / "p1.nii.gz")
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    save_nifti(seg, gt_dir / "p1.nii.gz")

    report = analyze_prediction_tree(root, tmp_path / "r.json", gt_seg_dir=gt_dir)
    ct = report["p1"]["contour_tracking"]["LV"]
    # zero flow + static GT contour -> zero tracking error
    assert ct["mean_error"] < 1e-3
