"""End-to-end 3D path: plan -> train unet3d -> predict 3D volumes."""

import yaml

from csof_tpu.cli import main as cli
import pytest


@pytest.mark.slow
def test_3d_train_predict(tmp_path):
    task = tmp_path / "task"
    pre = tmp_path / "pre"
    results = tmp_path / "results"
    cli.convert_acdc_entry(["-o", str(task), "--synthetic", "2"])
    cli.plan_and_preprocess_entry(["-t", str(task), "-o", str(pre), "--num-workers", "1"])
    assert (pre / "plans_3D.json").exists()

    cfg = {
        "model": "unet3d",
        "max_num_epochs": 1,
        "num_batches_per_epoch": 2,
        "num_val_batches_per_epoch": 1,
        "data": {"do_data_aug": False},
        "optim": {"optimizer": "sgd", "scheduler": "poly", "initial_lr": 0.01},
    }
    cfg_path = tmp_path / "exp3d.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cli.train_entry(["-c", str(cfg_path), "-p", str(pre), "-o", str(results),
                     "-f", "0", "--max-epochs", "1"])
    fold = results / "fold_0"
    assert (fold / "model_final_checkpoint.msgpack").exists()

    pred_out = tmp_path / "preds3d"
    cli.predict_entry(["-m", str(fold), "-i", str(task / "imagesTr"), "-o", str(pred_out),
                       "--disable-tta"])
    assert len(list(pred_out.glob("*.nii.gz"))) == 4
