"""End-to-end CLI drive: phantom -> convert -> plan/preprocess -> train ->
predict -> evaluate -> flow-tree analysis. The closest thing to the
reference's full nnUNet_train/nnUNet_predict cycle, on synthetic data."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from csof_tpu.cli import main as cli


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.mark.slow
def test_full_cycle(workspace):
    task = workspace / "task"
    pre = workspace / "pre"
    results = workspace / "results"
    cli.convert_acdc_entry(["-o", str(task), "--synthetic", "2"])
    assert (task / "dataset.json").exists()

    cli.plan_and_preprocess_entry(["-t", str(task), "-o", str(pre), "--num-workers", "1"])
    assert (pre / "plans_2D.json").exists()
    assert list((pre / "preprocessed_2d").glob("*.npz"))

    cfg = {
        "model": "unet2d",
        "max_num_epochs": 1,
        "num_batches_per_epoch": 3,
        "num_val_batches_per_epoch": 1,
        "optim": {"optimizer": "sgd", "scheduler": "poly", "initial_lr": 0.01},
    }
    cfg_path = workspace / "exp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cli.train_entry([
        "-c", str(cfg_path), "-p", str(pre), "-o", str(results), "-f", "0", "--max-epochs", "1",
    ])
    fold = results / "fold_0"
    assert (fold / "model_final_checkpoint.msgpack").exists()
    assert (fold / "config.yaml").exists() and (fold / "plans.json").exists()

    pred_out = workspace / "preds"
    cli.predict_entry(["-m", str(fold), "-i", str(task / "imagesTr"), "-o", str(pred_out),
                       "--disable-tta"])
    preds = list(pred_out.glob("*.nii.gz"))
    assert len(preds) == 4  # 2 patients x ED/ES

    cli.evaluate_entry([
        "-p", str(pred_out), "-r", str(task / "labelsTr"), "-l", "1", "2", "3",
        "-o", str(workspace / "summary.json"),
    ])
    summary = json.loads((workspace / "summary.json").read_text())
    assert "mean" in summary and "1" in summary["mean"]


def test_flow_tree_analysis_cli(workspace, tmp_path):
    # synthesize a small prediction tree and run the strain/jacobian CLI
    from csof_tpu.utils.nifti import save_nifti

    root = tmp_path / "tree"
    (root / "Flow").mkdir(parents=True)
    (root / "Segmentation").mkdir()
    (root / "Registered").mkdir()
    t, d, h, w = 3, 2, 24, 24
    rng = np.random.RandomState(0)
    flow = rng.randn(2, t, d, h, w).astype(np.float32) * 0.1
    np.savez_compressed(root / "Flow" / "patient001.npz", flow=flow)
    seg = np.zeros((t, d, h, w), np.uint8)
    seg[:, :, 8:16, 8:16] = 3
    seg[:, :, 6:8, 8:16] = 2
    save_nifti(seg, root / "Segmentation" / "patient001.nii.gz")
    save_nifti(rng.rand(t, d, h, w).astype(np.float32), root / "Registered" / "patient001.nii.gz")

    cli.strain_entry(["-i", str(root)])
    report = json.loads((root / "analysis.json").read_text())
    assert "patient001" in report
    assert "jacobian" in report["patient001"]
    assert "LV" in report["patient001"]["jacobian"]
    assert (root / "analysis.csv").exists()


@pytest.mark.slow  # consumes test_full_cycle's workspace (also slow-marked)
def test_model_zoo_and_utility_clis(workspace, tmp_path):
    """The thin-wrapper console scripts: determine_postprocessing,
    export/install model zip, print models, change model kind, task overlay
    PNGs, decathlon conversion (ref: setup.py:29-53 console_scripts)."""
    task = workspace / "task"
    fold = workspace / "results" / "fold_0"
    pred_out = workspace / "preds"
    assert fold.exists() and pred_out.exists()  # runs after test_full_cycle

    # determine_postprocessing on the validation predictions
    pp_json = tmp_path / "postprocessing.json"
    cli.determine_postprocessing_entry([
        "-p", str(pred_out), "-r", str(task / "labelsTr"), "-l", "1", "2", "3",
        "-o", str(pp_json),
    ])
    decision = json.loads(pp_json.read_text())
    assert "for_which_classes" in decision

    # export -> install roundtrip preserves the checkpoint + sidecars
    zip_path = tmp_path / "model.zip"
    cli.export_model_entry(["-m", str(fold), "-o", str(zip_path)])
    installed = tmp_path / "installed"
    cli.install_model_entry([str(zip_path), "-o", str(installed)])
    assert (installed / "model_final_checkpoint.msgpack").exists()
    assert (installed / "config.yaml").exists()

    # print_available_models sees the installed model
    cli.print_models_entry(["-r", str(tmp_path)])

    # change_model rewrites the sidecar kind
    cli.change_model_entry(["-m", str(installed), "-k", "unet2d"])
    assert "unet2d" in (installed / "config.yaml").read_text()

    # overlay PNGs for the raw task
    overlays = tmp_path / "overlays"
    cli.plot_task_pngs_entry(["-t", str(task), "-o", str(overlays)])
    assert list(overlays.glob("*.png"))

    # decathlon conversion: our raw task doubles as a 3D decathlon-style one
    dec_out = tmp_path / "decathlon"
    cli.convert_decathlon_entry(["-i", str(task), "-o", str(dec_out)])
    assert list((dec_out / "imagesTr").glob("*_0000.nii.gz"))
    assert (dec_out / "dataset.json").exists()
