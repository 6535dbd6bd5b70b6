"""Radial strain + AI-vs-GT strain curve metrics.

ref: compute_strain_curve_metric.py (mean-curve comparison),
compute_stats_strain.py (per-case L2 distances + peak table),
Medis Sradial_LV_curve semantics.
"""

import numpy as np
import pytest
from scipy.io import savemat

from csof_tpu.analysis.strain_curves import (
    aggregate_strain_curve_metrics,
    case_curve_metrics,
    curve_peaks,
    load_strain_curves,
    mean_curves,
    resample_curve,
)
from csof_tpu.ops.strain import myocardial_thickness, radial_strain_curve


def _annulus(h, r_in, r_out, center=None):
    """Label frame: 3 = LV cavity (disk r<r_in), 2 = myocardium (ring)."""
    c = center or (h // 2, h // 2)
    yy, xx = np.mgrid[0:h, 0:h]
    r = np.sqrt((yy - c[0]) ** 2 + (xx - c[1]) ** 2)
    lab = np.zeros((h, h), np.uint8)
    lab[r < r_out] = 2
    lab[r < r_in] = 3
    return lab


def test_myocardial_thickness_annulus():
    # ring from r=8 to r=16 -> wall thickness ~8 px
    th = myocardial_thickness(_annulus(64, 8, 16))
    assert th == pytest.approx(8.0, abs=1.0)
    # empty LV -> nan
    assert np.isnan(myocardial_thickness(np.zeros((32, 32), np.uint8)))


def test_radial_strain_wall_thickening():
    """Systolic thickening: cavity shrinks, wall thickens -> positive radial
    strain, magnitude = relative thickness change."""
    seq = np.stack([
        _annulus(64, 12, 18),  # ED: thickness 6
        _annulus(64, 9, 18),   # thickness 9 (+50%)
        _annulus(64, 6, 18),   # ES: thickness 12 (+100%)
        _annulus(64, 12, 18),  # back to ED
    ])
    s = radial_strain_curve(seq)
    assert s[0] == pytest.approx(0.0)
    assert s[1] == pytest.approx(50.0, abs=12.0)
    assert s[2] == pytest.approx(100.0, abs=15.0)
    assert abs(s[3]) < 6.0
    assert s[2] > s[1] > s[0]


def test_resample_curve_endpoints_and_linearity():
    c = np.array([0.0, 2.0, 4.0, 6.0])
    r = resample_curve(c, 7)
    assert r[0] == pytest.approx(0.0)
    assert r[-1] == pytest.approx(6.0)
    np.testing.assert_allclose(r, np.linspace(0, 6, 7))  # linear stays linear


def test_curve_peaks_layout():
    c = np.array([0.0, 5.0, 12.0, 7.0, 1.0])
    p = curve_peaks(c)
    assert p.shape == (2, 2)
    assert p[0, 0] == 2 and p[1, 0] == 12.0  # ES = global extremum
    assert p[0, 1] == 4 and p[1, 1] == 1.0   # ED = final frame
    # negative (circumferential) curves peak at the most negative point
    assert curve_peaks(-c)[1, 0] == -12.0


def test_load_mat_npz_npy(tmp_path):
    radial = np.linspace(0, 30, 10)
    circ = -np.linspace(0, 20, 10)
    savemat(tmp_path / "case1_ai.mat", {
        "Structure_ai": {
            "Sradial_LV_curve": radial,
            "Scirc_LV_curve": circ,
            "Sradial_LV_peak": np.array([[9, 9], [30.0, 30.0]]),
        }
    })
    rec = load_strain_curves(tmp_path / "case1_ai.mat")
    np.testing.assert_allclose(rec["curves"]["radial_lv"], radial)
    np.testing.assert_allclose(rec["curves"]["circ_lv"], circ)
    assert rec["peaks"]["radial_lv"].shape == (2, 2)

    np.savez(tmp_path / "case1.npz", Sradial_LV_curve=radial, Scirc_RV_curve=circ)
    rec2 = load_strain_curves(tmp_path / "case1.npz")
    assert set(rec2["curves"]) == {"radial_lv", "circ_rv"}

    np.save(tmp_path / "case1.npy", radial)
    rec3 = load_strain_curves(tmp_path / "case1.npy")
    np.testing.assert_allclose(rec3["curves"]["radial_lv"], radial)


def test_case_metrics_l2_distance():
    """distance = np.linalg.norm(ai - gt) (ref: compute_stats_strain.py:28)."""
    gt_c = np.array([0.0, 10.0, 20.0, 10.0])
    ai_c = gt_c + 1.0
    ai = {"curves": {"radial_lv": ai_c}, "peaks": {}}
    gt = {"curves": {"radial_lv": gt_c}, "peaks": {}}
    m = case_curve_metrics(ai, gt)
    assert m["distance_radial_lv"] == pytest.approx(np.linalg.norm(ai_c - gt_c))
    assert m["ES_peak_value_gt_radial_lv"] == 20.0
    # different lengths -> AI resampled to GT length first
    ai2 = {"curves": {"radial_lv": resample_curve(ai_c, 9)}, "peaks": {}}
    m2 = case_curve_metrics(ai2, gt)
    # round-trip resampling is only exact at shared nodes; stays close
    assert m2["distance_radial_lv"] == pytest.approx(m["distance_radial_lv"], abs=0.5)


def test_mean_curves_resamples_to_longest():
    recs = [
        {"curves": {"radial_lv": np.linspace(0, 10, 5)}},
        {"curves": {"radial_lv": np.linspace(0, 10, 9)}},
    ]
    out = mean_curves(recs)
    assert len(out["radial_lv"]) == 9
    np.testing.assert_allclose(out["radial_lv"], np.linspace(0, 10, 9), atol=1e-9)


def test_aggregate_and_cli(tmp_path):
    ai_dir, gt_dir = tmp_path / "AI", tmp_path / "GT"
    ai_dir.mkdir(), gt_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        t = 8 + i
        gt_c = 25 * np.sin(np.linspace(0, np.pi, t))
        ai_c = gt_c + rng.randn(t)
        savemat(ai_dir / f"p{i}_slice01_ai.mat",
                {"Structure_ai": {"Sradial_LV_curve": ai_c, "Scirc_LV_curve": -ai_c / 2}})
        savemat(gt_dir / f"p{i}_slice01_gt.mat",
                {"Structure_gt": {"Sradial_LV_curve": gt_c, "Scirc_LV_curve": -gt_c / 2}})
    res = aggregate_strain_curve_metrics(
        [(ai_dir / f"p{i}_slice01_ai.mat", gt_dir / f"p{i}_slice01_gt.mat") for i in range(3)],
        csv_out=tmp_path / "strain_metrics.csv",
        json_out=tmp_path / "summary.json",
    )
    assert len(res["cases"]) == 3
    assert res["mean"]["distance_radial_lv"] < 5.0
    assert len(res["mean_curves"]["GT"]["radial_lv"]) == 10  # longest T
    assert (tmp_path / "strain_metrics.csv").read_text().startswith("case,")
    assert (tmp_path / "summary.json").exists()

    # CLI end-to-end (sorted-order pairing, like the reference's glob-zip)
    from csof_tpu.cli.main import strain_curve_metric_entry

    out_dir = tmp_path / "out"
    strain_curve_metric_entry(["--ai", str(ai_dir), "--gt", str(gt_dir), "-o", str(out_dir)])
    assert (out_dir / "strain_metrics.csv").exists()
    assert (out_dir / "strain_curve_summary.json").exists()
