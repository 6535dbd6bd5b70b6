import numpy as np

from csof_tpu.evaluation.model_selection import find_best_configuration


def test_find_best_configuration_picks_better_and_ensembles(tmp_path):
    rng = np.random.RandomState(0)
    gt = np.zeros((16, 16), np.uint8)
    gt[4:12, 4:12] = 1

    def softmax_from_seg(seg, acc):
        sm = np.zeros((2, 16, 16), np.float32)
        sm[1] = np.where(seg == 1, acc, 1 - acc)
        sm[0] = 1 - sm[1]
        return sm

    good = softmax_from_seg(gt, 0.9)
    noisy_seg = gt.copy()
    noisy_seg[0:3, 0:3] = 1
    bad = softmax_from_seg(noisy_seg, 0.8)

    res = find_best_configuration(
        {"good": [good], "bad": [bad]}, [gt], classes=[1],
        output_file=tmp_path / "best.json",
    )
    assert res["best"] in ("good", "ensemble_bad+good")
    assert res["scores"]["good"] > res["scores"]["bad"]
    assert "ensemble_bad+good" in res["scores"]
    assert (tmp_path / "best.json").exists()
