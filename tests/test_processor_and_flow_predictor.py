"""ROI processor + full-cine flow predictor tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.inference.flow_predictor import FlowPredictor, predict_and_export_case
from csof_tpu.inference.processor import Processor, adjust_cropping_window, mask_centroid
from csof_tpu.models.segflow import SegFlow


def test_mask_centroid_and_window():
    mask = np.zeros((64, 64), bool)
    mask[10:20, 30:50] = True
    cy, cx = mask_centroid(mask)
    assert (cy, cx) == (14.5, 39.5)
    y0, x0 = adjust_cropping_window(cy, cx, (64, 64), 32)
    assert 0 <= y0 <= 32 and 0 <= x0 <= 32
    # window near border gets clamped inside
    y0, x0 = adjust_cropping_window(2, 62, (64, 64), 32)
    assert y0 == 0 and x0 == 32


def test_processor_crop_uncrop_roundtrip():
    proc = Processor(crop_size=16)
    frames = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
    mask = np.zeros((40, 40), bool)
    mask[20:30, 20:30] = True
    cropped, rec = proc.crop(frames, mask=mask)
    assert cropped.shape == (3, 16, 16)
    back = proc.uncrop(cropped, rec)
    assert back.shape == (3, 40, 40)
    y0, x0 = rec["y0"], rec["x0"]
    np.testing.assert_allclose(back[:, y0 : y0 + 16, x0 : x0 + 16], cropped)
    assert back[0, 0, 0] == 0


def test_processor_translate():
    img = np.zeros((8, 8), np.float32)
    img[2, 3] = 1.0
    out = Processor.translate(img, 2, -1)
    assert out[4, 2] == 1.0
    dy, dx = Processor.get_translation(img > 0, out > 0)
    assert (dy, dx) == (-2, 1)


def test_strain_mask():
    seg = np.zeros((32, 32), np.int32)
    seg[10:22, 10:22] = 2
    m = Processor.get_strain_mask(seg, 2)
    assert m.max() == pytest.approx(1.0)
    assert m[10, 10] > m[0, 0]


@pytest.fixture(scope="module")
def tiny_segflow_apply():
    cfg = SegFlowModelConfig(
        out_encoder_dims=(4, 8), d_model=8, bottleneck_heads=2, dim_feedforward=16,
        corr_radius=(1, 1), corr_stride=(1, 1), dtype="float32",
    )
    model = SegFlow(cfg=cfg, num_classes=4)
    import jax

    video = jnp.zeros((3, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), video)
    return lambda v: model.apply(params, v)


def test_flow_predictor_full_cine(tiny_segflow_apply, tmp_path):
    pred = FlowPredictor(tiny_segflow_apply, crop_size=16, do_mirroring=True)
    video = np.random.RandomState(0).rand(3, 2, 24, 24).astype(np.float32)
    res = pred.predict_video(video)
    assert res["softmax"].shape == (4, 3, 2, 24, 24)
    assert res["seg"].shape == (3, 2, 24, 24)
    assert res["flow"].shape == (3, 2, 24, 24, 2)
    assert res["registered"].shape == (3, 2, 24, 24)
    np.testing.assert_allclose(res["softmax"].sum(0), 1.0, atol=1e-4)

    out = predict_and_export_case(pred, video, {"spacing_after_resampling": (5.0, 1.0, 1.0)},
                                  tmp_path, "patient001")
    assert (tmp_path / "Flow" / "patient001.npz").exists()
    assert (tmp_path / "Registered" / "patient001.nii.gz").exists()
    assert (tmp_path / "Segmentation" / "patient001.nii.gz").exists()
    flow = np.load(tmp_path / "Flow" / "patient001.npz")["flow"]
    assert flow.shape == (2, 3, 2, 24, 24)


def test_sequence_roi_covers_moving_heart():
    """The ROI window must come from masks over the WHOLE sequence
    (ref: processor.py:38 get_fixed_info), not frame 0's middle slice: a
    bright blob drifting across frames stays inside the union-mask window
    at every phase, while the frame-0-only window clips the extremes."""
    t, d, h, w = 6, 3, 64, 64
    video = np.zeros((t, d, h, w), np.float32)
    centers = np.linspace(20, 40, t).astype(int)  # apical-style drift (fits the crop)
    for ti, cy in enumerate(centers):
        for zi in range(d):
            video[ti, zi, cy - 4 : cy + 4, 28:36] = 1.0

    pred = FlowPredictor.__new__(FlowPredictor)  # only need the ROI logic
    pred.processor = Processor(crop_size=32)
    pred.crop_size = 32
    union = pred._sequence_roi_mask(video)
    # union mask sees the blob at every phase
    for cy in centers:
        assert union[cy, 31]
    _, rec = pred.processor.crop(video[0, d // 2], mask=union)
    y0 = rec["y0"]
    assert y0 <= centers.min() - 4 + 1 and centers.max() + 4 <= y0 + 32 + 1, (
        f"window [{y0}, {y0+32}) misses blob range [{centers.min()-4}, {centers.max()+4})"
    )
    # the old single-plane window demonstrably clips the far extreme
    mask0 = pred.processor.get_mask(video[0, d // 2])
    _, rec0 = pred.processor.crop(video[0, d // 2], mask=mask0)
    assert centers.max() + 4 > rec0["y0"] + 32
