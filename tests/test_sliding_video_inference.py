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


class _AnalyticFlowPredictor:
    """predict_video stub returning known spatially varying cumulative flows
    so the cross-chunk composition ORDER is testable (real models agree
    between chunks only approximately; constant flows commute and hide an
    argument swap)."""

    def __init__(self, t_total, d, h, w):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # per-frame global "increment style" fields, smooth + spatially varying
        self.fields = np.stack(
            [
                np.stack(
                    [
                        0.9 * np.sin(2 * np.pi * (xx + 3 * t) / w),
                        0.7 * np.cos(2 * np.pi * (yy - 2 * t) / h),
                    ],
                    -1,
                )
                for t in range(t_total)
            ]
        ).astype(np.float32)  # (T, H, W, 2)
        self.t_total, self.d, self.h, self.w = t_total, d, h, w
        self.calls: list[int] = []  # chunk start frames, in call order
        self._next_t0 = 0

    def chunk_flow(self, t0, ti):
        """Cumulative flow of chunk frame ti to the chunk anchor t0."""
        if ti == 0:
            return np.zeros((self.h, self.w, 2), np.float32)
        return self.fields[t0 + ti - 1] * ti / 2.0

    def predict_video(self, chunk):
        tc = chunk.shape[0]
        t0 = self._next_t0
        self.calls.append(t0)
        flow = np.stack(
            [np.broadcast_to(self.chunk_flow(t0, ti), (self.d, self.h, self.w, 2)) for ti in range(tc)]
        )
        self._next_t0 = t0  # updated by the caller pattern below
        return {
            "flow": flow,
            "seg": np.zeros((tc, self.d, self.h, self.w), np.int64),
            "softmax": np.zeros((2, tc, self.d, self.h, self.w), np.float32),
            "registered": np.zeros((tc, self.d, self.h, self.w), np.float32),
        }


def test_sliding_multichunk_composition_order():
    """Cross-chunk flows must compose chunk-flow FIRST, carry SECOND
    (compose_flows(chunk, carry)): frame t of a later chunk registers to the
    global anchor via warp(warp(frame, chunk_flow), carry)."""
    from csof_tpu.ops.warp import compose_flows

    t, d, h, w = 5, 1, 24, 24
    window, overlap = 3, 1
    stub = _AnalyticFlowPredictor(t, d, h, w)

    # predict_video_sliding feeds chunks [0:3] then [2:5]; track t0 by length
    starts = iter([0, 2])

    orig = stub.predict_video

    def predict_video(chunk):
        stub._next_t0 = next(starts)
        return orig(chunk)

    stub.predict_video = predict_video
    res = predict_video_sliding(stub, np.zeros((t, d, h, w), np.float32),
                                window=window, overlap=overlap)
    assert stub.calls == [0, 2]

    carry = jnp.asarray(stub.chunk_flow(0, 2))  # global flow at frame 2
    for tg, ti in ((3, 1), (4, 2)):
        expected = np.asarray(compose_flows(jnp.asarray(stub.chunk_flow(2, ti)), carry))
        np.testing.assert_allclose(res["flow"][tg, 0], expected, atol=1e-5)
        # the swapped order must NOT match (fields are spatially varying)
        swapped = np.asarray(compose_flows(carry, jnp.asarray(stub.chunk_flow(2, ti))))
        assert np.abs(res["flow"][tg, 0] - swapped).max() > 0.05


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
