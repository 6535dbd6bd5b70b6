"""M&Ms conversion, vendor-generalization splits, and NoNorm ACDC variants."""

import json

import numpy as np

from csof_tpu.data.conversion.acdc import convert_acdc, make_synthetic_acdc
from csof_tpu.data.conversion.mnms import (
    convert_mnms,
    make_generalization_splits,
    make_synthetic_mnms,
    read_mnms_info,
)
from csof_tpu.utils.nifti import load_nifti


def test_mnms_conversion_layout(tmp_path):
    info_csv = make_synthetic_mnms(tmp_path / "raw", num_patients=4, num_frames=6)
    info = read_mnms_info(info_csv)
    assert len(info) == 4
    out = tmp_path / "task"
    dj = convert_mnms(tmp_path / "raw", info_csv, out)
    # 4 patients x 2 annotated frames (ED+ES), vendors alternate A/B (no C)
    assert dj["numTraining"] == 8
    assert dj["labels"]["1"] == "LVBP" and dj["labels"]["3"] == "RV"
    imgs = sorted((out / "imagesTr").glob("*.nii.gz"))
    lbls = sorted((out / "labelsTr").glob("*.nii.gz"))
    assert len(imgs) == 8 and len(lbls) == 8
    # case naming <pat>_<ts:04d>_<vendor>_<centre>_0000 (ref filename scheme)
    assert imgs[0].name == "M001_0000_A_1_0000.nii.gz"
    # labels carry segmentation at the annotated frame
    seg = load_nifti(lbls[0]).data_czyx
    assert seg.max() == 3
    # cine kept for the video pipeline
    assert len(list((out / "cine").glob("*_4d.nii.gz"))) == 4
    # ED/ES + vendor metadata recorded
    assert dj["ed_es_numbers"]["M001"] == {"ed": 0, "es": 3}
    assert dj["vendors"]["M002"]["vendor"] == "B"


def test_mnms_vendor_c_skipped(tmp_path):
    info_csv = make_synthetic_mnms(tmp_path / "raw", num_patients=2)
    # rewrite patient 2 as vendor C (the test vendor the reference skips)
    text = info_csv.read_text().replace("M002,0,3,B", "M002,0,3,C")
    info_csv.write_text(text)
    dj = convert_mnms(tmp_path / "raw", info_csv, tmp_path / "task")
    assert dj["numTraining"] == 2  # only M001's ED/ES
    assert "M002" not in dj["ed_es_numbers"]


def test_generalization_splits():
    cases = []
    for i in range(10):
        pid = f"M{i:03d}"
        vendor = "AB"[i % 2]
        for ts in (0, 3):
            cases.append(f"{pid}_{ts:04d}_{vendor}_1")
    base = [{"train": cases[:16], "val": cases[16:]}] * 5
    splits = make_generalization_splits(cases, base)
    assert len(splits) == 8
    fold_a, fold_b, fold_ab = splits[5], splits[6], splits[7]
    assert all("_A_" in c for c in fold_a["train"])
    assert all("_B_" in c for c in fold_b["train"])
    # folds share the same A+B validation set
    assert fold_a["val"] == fold_b["val"] == fold_ab["val"]
    assert set(fold_ab["train"]) == set(fold_a["train"]) | set(fold_b["train"])
    # no leakage: no patient appears in both train and val of a fold
    for f in (fold_a, fold_b, fold_ab):
        tr_p = {c.split("_")[0] for c in f["train"]}
        va_p = {c.split("_")[0] for c in f["val"]}
        assert not (tr_p & va_p)


def test_mnms_plan_and_preprocess_e2e(tmp_path):
    """Phantom e2e over the M&Ms layout: convert -> plan -> preprocess."""
    from csof_tpu.cli import main as cli

    out = tmp_path / "task"
    cli.convert_mnms_entry(["-o", str(out), "--synthetic", "2"])
    cli.plan_and_preprocess_entry(
        ["-t", str(out), "-o", str(tmp_path / "pre"), "--num-workers", "1"]
    )
    assert (tmp_path / "pre" / "plans_2D.json").exists()
    assert list((tmp_path / "pre" / "preprocessed_2d").glob("*.npz"))


def test_acdc_nonorm_variant(tmp_path):
    make_synthetic_acdc(tmp_path / "raw", num_patients=2, num_frames=6)
    out = tmp_path / "task"
    dj = convert_acdc(tmp_path / "raw", out, no_norm=True, export_unlabeled=True)
    assert dj["name"] == "ACDCNoNorm"
    assert dj["modality"]["0"] == "noNorm"
    # 6 frames, 2 annotated -> 4 unlabeled per patient
    assert dj["numUnlabeled"] == 8
    u_imgs = sorted((out / "imagesTr").glob("*_u_0000.nii.gz"))
    assert len(u_imgs) == 8
    assert "patient001_frame02_u_0000.nii.gz" in {p.name for p in u_imgs}

    # the planner must pick the no-op scheme for the noNorm modality
    # (end-to-end through the CLI, which feeds dataset.json modalities in)
    from csof_tpu.cli import main as cli

    cli.plan_and_preprocess_entry(
        ["-t", str(out), "-o", str(out.parent / "pre"), "--num-workers", "1"]
    )
    plans = json.loads((out.parent / "pre" / "plans_2D.json").read_text())
    schemes = plans["normalization_schemes"]
    assert schemes["0"] == "noNorm" or schemes.get(0) == "noNorm", schemes
