import json

import numpy as np

from csof_tpu.cli.main import find_best_configuration_entry
from csof_tpu.utils.nifti import save_nifti


def test_find_best_configuration_cli(tmp_path):
    gt = np.zeros((4, 12, 12), np.uint8)
    gt[:, 3:9, 3:9] = 1

    def dump(folder, acc):
        folder.mkdir(parents=True, exist_ok=True)
        sm = np.zeros((2, 4, 12, 12), np.float32)
        sm[1] = np.where(gt == 1, acc, 1 - acc)
        sm[0] = 1 - sm[1]
        np.savez_compressed(folder / "case1.npz", softmax=sm)

    dump(tmp_path / "good", 0.9)
    bad = tmp_path / "bad"
    bad.mkdir()
    sm = np.zeros((2, 4, 12, 12), np.float32)
    noisy = gt.copy()
    noisy[:, 0:2, 0:2] = 1
    sm[1] = np.where(noisy == 1, 0.8, 0.2)
    sm[0] = 1 - sm[1]
    np.savez_compressed(bad / "case1.npz", softmax=sm)

    ref_dir = tmp_path / "gt"
    ref_dir.mkdir()
    save_nifti(gt, ref_dir / "case1.nii.gz")

    out = tmp_path / "best.json"
    find_best_configuration_entry([
        "-f", f"good={tmp_path/'good'}", f"bad={bad}",
        "-r", str(ref_dir), "-l", "1", "-o", str(out),
    ])
    res = json.loads(out.read_text())
    assert res["best"] in ("good", "ensemble_bad+good")
    assert res["scores"]["good"] > res["scores"]["bad"]
