"""Fold validation path (train -> --validation-only)."""

import json

import yaml

from csof_tpu.cli import main as cli


def test_validation_only_flow(tmp_path):
    task = tmp_path / "task"
    pre = tmp_path / "pre"
    results = tmp_path / "results"
    cli.convert_acdc_entry(["-o", str(task), "--synthetic", "2"])
    cli.plan_and_preprocess_entry(["-t", str(task), "-o", str(pre), "--num-workers", "1"])
    cfg = {
        "model": "unet2d",
        "max_num_epochs": 1,
        "num_batches_per_epoch": 2,
        "num_val_batches_per_epoch": 1,
        "data": {"do_data_aug": True},
    }
    cfg_path = tmp_path / "exp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cli.train_entry(["-c", str(cfg_path), "-p", str(pre), "-o", str(results),
                     "-f", "0", "--max-epochs", "1"])
    cli.train_entry(["-c", str(cfg_path), "-p", str(pre), "-o", str(results),
                     "-f", "0", "--validation-only"])
    val_dir = results / "fold_0" / "validation_raw"
    assert (val_dir / "summary.json").exists()
    summary = json.loads((val_dir / "summary.json").read_text())
    assert "mean" in summary and "1" in summary["mean"]
    assert len(list(val_dir.glob("*.nii.gz"))) >= 1
