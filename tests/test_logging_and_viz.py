"""Logging, progress plots, visualization tests."""

import numpy as np
import pytest

from csof_tpu.utils.logging import (
    TrainingLog,
    count_parameters,
    dump_debug_json,
    model_summary,
    plot_progress,
)
from csof_tpu.utils.visualization import flow_to_image, seg_overlay, strain_curve_figure


def test_training_log(tmp_path):
    log = TrainingLog(tmp_path, also_print=False)
    log("hello", 42)
    content = log.file.read_text()
    assert "hello 42" in content


def test_plot_progress(tmp_path):
    out = plot_progress(tmp_path, [1.0, 0.5, 0.3], [1.1, 0.6, 0.4], [0.2, 0.5, 0.7])
    assert out.exists() and out.stat().st_size > 0


def test_debug_json(tmp_path):
    dump_debug_json(tmp_path, {"a": np.array([1, 2]), "b": "x"})
    assert (tmp_path / "debug.json").exists()


def test_param_counting():
    import jax
    import jax.numpy as jnp
    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(num_classes=2, base_num_features=4,
                      pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                      deep_supervision=False)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    n = count_parameters(params)
    assert n > 1000
    summary = model_summary(params["params"])
    assert f"total params: {n:,}" in summary


def test_flow_to_image_colors():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4] = [0, 1]   # rightward
    flow[4:] = [0, -1]  # leftward
    img = flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # opposite directions -> different colors
    assert not np.array_equal(img[0, 0], img[7, 7])


def test_seg_overlay():
    img = np.random.RandomState(0).rand(16, 16).astype(np.float32)
    seg = np.zeros((16, 16), np.int32)
    seg[4:8, 4:8] = 2
    out = seg_overlay(img, seg)
    assert out.shape == (16, 16, 3)
    # labeled region tinted green-ish (class 2)
    assert out[5, 5, 1] > out[5, 5, 0] or out[5, 5, 1] > out[5, 5, 2]


def test_strain_figure(tmp_path):
    p = strain_curve_figure({"rv": [0, 5, 10], "lv": [0, -3, -8]}, tmp_path / "s.png")
    assert p.exists()


def test_tensorboard_visualizer(tmp_path):
    from csof_tpu.utils.visualization import TensorBoardVisualizer

    tb = TensorBoardVisualizer(tmp_path)
    tb.log_scalars({"loss": 1.0}, 0)
    tb.log_flow("flow", np.zeros((8, 8, 2), np.float32), 0)
    tb.log_seg("seg", np.zeros((8, 8), np.float32), np.zeros((8, 8), np.int32), 0)
    tb.close()
    assert list(tmp_path.glob("events.*"))
