"""Cascade: lowres predictions -> one-hot extra channels for fullres."""

import numpy as np

from csof_tpu.training.cascade import (
    concat_prev_stage,
    load_prev_stage_onehot,
    predict_next_stage,
)


def test_cascade_roundtrip(tmp_path):
    # fake preprocessed dataset of 2 cases
    ds = {}
    rng = np.random.RandomState(0)
    for case in ("caseA", "caseB"):
        data = rng.rand(2, 4, 8, 8).astype(np.float32)  # 1 modality + seg
        np.save(tmp_path / f"{case}.npy", data)
        import pickle

        with open(tmp_path / f"{case}.pkl", "wb") as f:
            pickle.dump({}, f)
        ds[case] = {
            "data_file": tmp_path / f"{case}.npz",
            "npy_file": tmp_path / f"{case}.npy",
            "properties_file": tmp_path / f"{case}.pkl",
        }

    def predict_fn(data):
        return (data[0] > 0.5).astype(np.int8) * 2  # pseudo 2-class seg

    out_dir = predict_next_stage(predict_fn, ds, tmp_path / "prev_stage",
                                 target_shapes={"caseA": (8, 16, 16), "caseB": (4, 8, 8)})
    assert (out_dir / "caseA_segFromPrevStage.npy").exists()

    oh = load_prev_stage_onehot(out_dir, "caseB", num_classes=3)
    assert oh.shape == (2, 4, 8, 8)
    assert set(np.unique(oh)) <= {0.0, 1.0}
    # resampled case keeps label values
    ohA = load_prev_stage_onehot(out_dir, "caseA", num_classes=3)
    assert ohA.shape == (2, 8, 16, 16)

    data = rng.rand(1, 4, 8, 8).astype(np.float32)
    cat = concat_prev_stage(data, oh)
    assert cat.shape == (3, 4, 8, 8)
    assert load_prev_stage_onehot(out_dir, "missing", 3) is None
