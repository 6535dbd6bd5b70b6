"""Phantom-driven rehearsal of the docs/REALDATA.md ACDC runbook.

Executes the EXACT entry-point sequence of the runbook (convert -> plan ->
seg train/predict/evaluate -> postprocessing decision -> flow train ->
predict_flow -> strain/jacobian -> strain-curve metrics) on the synthetic
phantom, with tiny epoch budgets, proving the real-data chain is one
command sequence with zero code changes the day ACDC data exists.

Usage: python tools/realdata_rehearsal.py [workdir]   (~5 min, warm CPU cache)
"""

import json
import shutil
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import yaml

from csof_tpu.cli import main as cli


def main():
    w = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/realdata_rehearsal")
    shutil.rmtree(w, ignore_errors=True)
    w.mkdir(parents=True)

    # 1. convert + plan (runbook: -i $ACDC; rehearsal: --synthetic phantom)
    cli.convert_acdc_entry(["-o", f"{w}/task", "--synthetic", "2", "--export-unlabeled"])
    cli.plan_and_preprocess_entry(["-t", f"{w}/task", "-o", f"{w}/pre", "--num-workers", "1"])

    # 2. seg training (full runbook uses defaults = the 1000-epoch V2 recipe)
    (w / "seg2d.yaml").write_text(yaml.safe_dump({
        "model": "unet2d", "max_num_epochs": 1, "num_batches_per_epoch": 3,
        "num_val_batches_per_epoch": 1,
        "optim": {"optimizer": "sgd", "scheduler": "poly", "initial_lr": 0.01},
    }))
    cli.train_entry(["-c", f"{w}/seg2d.yaml", "-p", f"{w}/pre", "-o", f"{w}/results_2d",
                     "-f", "0", "--max-epochs", "1"])

    # 3. predict + evaluate + postprocessing decision
    cli.predict_entry(["-m", f"{w}/results_2d/fold_0", "-i", f"{w}/task/imagesTr",
                       "-o", f"{w}/preds_2d", "--disable-tta", "--save-npz"])
    cli.evaluate_entry(["-p", f"{w}/preds_2d", "-r", f"{w}/task/labelsTr",
                        "-l", "1", "2", "3", "-o", f"{w}/summary_2d.json"])
    summary = json.loads((w / "summary_2d.json").read_text())
    assert all(k in summary.get("mean", {}) for k in ("1", "2", "3")), summary.keys()
    cli.determine_postprocessing_entry(["-p", f"{w}/preds_2d", "-r", f"{w}/task/labelsTr",
                                        "-l", "1", "2", "3"])

    # 4. flow training + cine inference (tiny segflow; runbook uses defaults)
    (w / "video.yaml").write_text(yaml.safe_dump({
        "model": "segflow", "max_num_epochs": 1, "num_batches_per_epoch": 2,
        "num_val_batches_per_epoch": 1,
        "segflow": {"out_encoder_dims": [8, 16], "d_model": 16, "bottleneck_heads": 2,
                    "dim_feedforward": 32, "corr_radius": [2, 2], "corr_stride": [1, 1],
                    "dtype": "float32"},
        "data": {"video_length": 3, "batch_size": 2, "crop_size": 32},
        "loss_weights": {"segmentation": 1.0},
    }))
    cli.train_entry(["-c", f"{w}/video.yaml", "-p", f"{w}/pre", "-t", f"{w}/task",
                     "-o", f"{w}/results_flow", "-f", "0", "--max-epochs", "1"])
    cli.predict_flow_entry(["-m", f"{w}/results_flow/fold_0", "-t", f"{w}/task",
                            "-o", f"{w}/flow_out", "--disable-tta"])

    # 5. strain / jacobian / curve metrics
    cli.strain_entry(["-i", f"{w}/flow_out"])
    report = json.loads((w / "flow_out/analysis.json").read_text())
    assert report and all("jacobian" in e for e in report.values())
    curves = sorted((w / "flow_out/strain_curves").glob("*.npz"))
    assert curves, "strain_entry wrote no per-case curve files"
    # runbook compares AI vs GT curve folders; rehearsal self-compares
    cli.strain_curve_metric_entry(["--ai", f"{w}/flow_out/strain_curves",
                                   "--gt", f"{w}/flow_out/strain_curves", "--match-names"])
    metrics = json.loads((w / "flow_out/strain_curves/strain_curve_summary.json").read_text())
    assert metrics, "no strain-curve metrics"

    print("REHEARSAL OK:", w)


if __name__ == "__main__":
    main()
