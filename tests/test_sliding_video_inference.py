"""Temporal sliding-window video inference + cropping-network processor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.inference.flow_predictor import (
    FlowPredictor,
    predict_video_sliding,
    processor_from_seg_model,
)
from csof_tpu.models.segflow import SegFlow


@pytest.fixture(scope="module")
def predictor():
    cfg = SegFlowModelConfig(
        out_encoder_dims=(4, 8), d_model=8, bottleneck_heads=2, dim_feedforward=16,
        corr_radius=(1, 1), corr_stride=(1, 1), dtype="float32",
    )
    model = SegFlow(cfg=cfg, num_classes=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 16, 16, 1)))
    return FlowPredictor(lambda v: model.apply(params, v), crop_size=16, do_mirroring=False)


def test_sliding_matches_shapes_and_frames(predictor):
    video = np.random.RandomState(0).rand(7, 2, 20, 20).astype(np.float32)
    res = predict_video_sliding(predictor, video, window=4, overlap=1)
    assert res["seg"].shape == (7, 2, 20, 20)
    assert res["flow"].shape == (7, 2, 20, 20, 2)
    assert res["softmax"].shape[1] == 7
    assert np.isfinite(res["flow"]).all()


def test_sliding_equals_onestep_for_short_video(predictor):
    video = np.random.RandomState(1).rand(3, 1, 20, 20).astype(np.float32)
    a = predictor.predict_video(video)
    b = predict_video_sliding(predictor, video, window=3, overlap=1)
    np.testing.assert_allclose(a["flow"], b["flow"], atol=1e-5)
    np.testing.assert_array_equal(a["seg"], b["seg"])


def test_processor_from_seg_model():
    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(num_classes=2, base_num_features=4,
                      pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                      deep_supervision=False)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    proc = processor_from_seg_model(lambda p, x: net.apply(p, x), params, (16, 16), crop_size=8)
    img = np.random.RandomState(0).rand(20, 24).astype(np.float32)
    mask = proc.get_mask(img)
    assert mask.shape == (20, 24)
    cropped, rec = proc.crop(img[None])
    assert cropped.shape == (1, 8, 8)
