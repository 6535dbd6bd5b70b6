"""End-to-end video/flow pipeline: phantom -> segflow train (tiny) ->
full-cine predict -> strain/jacobian analysis."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from csof_tpu.cli import main as cli


def test_video_train_and_flow_predict(tmp_path):
    task = tmp_path / "task"
    cli.convert_acdc_entry(["-o", str(task), "--synthetic", "2"])

    cfg = {
        "model": "segflow",
        "max_num_epochs": 1,
        "num_batches_per_epoch": 2,
        "num_val_batches_per_epoch": 1,
        "segflow": {
            "out_encoder_dims": [8, 16],
            "d_model": 16,
            "bottleneck_heads": 2,
            "dim_feedforward": 32,
            "corr_radius": [2, 2],
            "corr_stride": [1, 1],
            "dtype": "float32",
        },
        "data": {"video_length": 3, "batch_size": 2, "crop_size": 32},
        "loss_weights": {"segmentation": 1.0},
    }
    cfg_path = tmp_path / "video.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    results = tmp_path / "results"
    cli.train_entry([
        "-c", str(cfg_path), "-p", str(tmp_path / "unused"), "-t", str(task),
        "-o", str(results), "-f", "0", "--max-epochs", "1",
    ])
    fold = results / "fold_0"
    assert (fold / "model_final_checkpoint.msgpack").exists()

    out = tmp_path / "flow_out"
    cli.predict_flow_entry([
        "-m", str(fold), "-t", str(task), "-o", str(out), "--disable-tta",
    ])
    flows = list((out / "Flow").glob("*.npz"))
    assert len(flows) == 2
    assert len(list((out / "Segmentation").glob("*.nii.gz"))) == 2
    assert len(list((out / "Registered").glob("*.nii.gz"))) == 2

    cli.strain_entry(["-i", str(out)])
    report = json.loads((out / "analysis.json").read_text())
    for pid, entry in report.items():
        assert "jacobian" in entry and "strain" in entry
        assert np.isfinite(entry["jacobian"]["global"]["abs_mean_j_minus_1"])
