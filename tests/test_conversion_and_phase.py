"""Lib conversion layout + per-phase aggregation tests."""

import json

import numpy as np
import pandas as pd

from csof_tpu.analysis.phase_results import merge_csvs, phase_of_case, results_per_phase
from csof_tpu.data.conversion.lib_dataset import convert_lib, convert_to_submission, make_lib_layout
from csof_tpu.utils.nifti import save_nifti


def test_lib_layout_and_conversion(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    vol = np.zeros((4, 8, 8), np.float32)
    for pid in ("patient_0001", "patient_0002"):
        for frame in ("frame01", "frame09"):
            save_nifti(vol, src / f"{pid}_{frame}.nii.gz")
            save_nifti(vol.astype(np.uint8), src / f"{pid}_{frame}_gt.nii.gz")
    out = tmp_path / "task"
    dj = convert_lib(src, out)
    assert dj["numTraining"] == 4
    assert (out / "strain" / "LV" / "radial").is_dir()
    assert (out / "contour" / "RV").is_dir()
    assert len(list((out / "labelsTr").glob("*.nii.gz"))) == 4

    sub = tmp_path / "sub"
    convert_to_submission(src, sub)
    assert (sub / "patient_00_ED.nii.gz").exists() or len(list(sub.glob("*_ED.nii.gz"))) >= 1


def test_phase_of_case():
    ed_es = {"patient001": {"ed": 1, "es": 5}}
    assert phase_of_case("patient001_frame01", ed_es) == "ED"
    assert phase_of_case("patient001_frame05", ed_es) == "ES"
    assert phase_of_case("patient001_frame03", ed_es) is None
    assert phase_of_case("x_ED") == "ED"


def test_results_per_phase(tmp_path):
    summary = {
        "all": [
            {"test": "/p/patient001_frame01.nii.gz", "1": {"Dice": 0.9}},
            {"test": "/p/patient001_frame05.nii.gz", "1": {"Dice": 0.7}},
        ],
        "mean": {},
    }
    f = tmp_path / "summary.json"
    f.write_text(json.dumps(summary))
    res = results_per_phase(f, {"patient001": {"ed": 1, "es": 5}})
    assert res["ED"]["1"] == 0.9
    assert res["ES"]["1"] == 0.7
    assert abs(res["all"]["1"] - 0.8) < 1e-9


def test_merge_csvs(tmp_path):
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    pd.DataFrame({"case": ["x", "y"], "dice": [0.9, 0.8]}).to_csv(a, index=False)
    pd.DataFrame({"case": ["x", "y"], "dice": [0.5, 0.6]}).to_csv(b, index=False)
    out = merge_csvs([a, b], tmp_path / "merged.csv")
    assert "dice_a" in out.columns and "dice_b" in out.columns
    assert len(out) == 2


def test_put_ed_first_roundtrip():
    from csof_tpu.data.video_dataset import put_ed_first, restore_frame_order

    frames = np.arange(5)[:, None] * np.ones((1, 2))
    rolled, _, inv = put_ed_first(frames, 3)
    assert rolled[0, 0] == 3
    back = restore_frame_order(rolled, inv)
    np.testing.assert_array_equal(back, frames)


def test_task_name_id(tmp_path):
    from csof_tpu.utils.io import find_task_name, task_name_to_id

    (tmp_path / "Task027_ACDC").mkdir()
    assert task_name_to_id("Task027_ACDC") == 27
    assert find_task_name(tmp_path, 27) == "Task027_ACDC"


def test_read_ed_es_csv(tmp_path):
    from csof_tpu.data.video_dataset import read_ed_es_csv

    f = tmp_path / "edes.csv"
    f.write_text("patient,ED,ES\npatient001,1,9\npatient002,2,8\n")
    m = read_ed_es_csv(f)
    assert m["patient001"] == {"ed": 1, "es": 9}
    assert m["patient002"]["es"] == 8
