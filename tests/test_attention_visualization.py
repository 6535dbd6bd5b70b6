"""Attention/similarity-map observability (VERDICT missing item 6;
ref: nnunet/visualization/visualization.py:370 log_sim_images, :1035
log_attn_map_images)."""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.config.experiment import SegFlowModelConfig
from csof_tpu.models.segflow import SegFlow
from csof_tpu.utils.visualization import TensorBoardVisualizer, attention_heatmap


def test_segflow_sows_attention_and_similarity():
    cfg = SegFlowModelConfig(
        out_encoder_dims=(4, 8),
        d_model=8,
        bottleneck_heads=2,
        dim_feedforward=16,
        corr_radius=(1, 1),
        corr_stride=(1, 1),
        dtype="float32",
    )
    model = SegFlow(cfg=cfg, num_classes=4)
    video = jnp.asarray(np.random.RandomState(0).rand(3, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    out, mut = model.apply(params, video, mutable=["intermediates"])
    assert out["flow"].shape == (3, 2, 16, 16)  # channel-major convention
    leaves = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(mut["intermediates"])
    }
    attn = [v for k, v in leaves.items() if "attn_weights" in k]
    sims = [v for k, v in leaves.items() if "sim_" in k]
    assert len(attn) == 2  # the two cross-attention bottlenecks
    assert len(sims) == 2  # one per encoder scale
    # stacked over the scanned time axis, key-space maps at bottleneck res
    assert attn[0].shape == (3, 8, 8)
    assert {s.shape for s in sims} == {(3, 16, 16), (3, 8, 8)}
    a = np.asarray(attn[0][1])
    assert np.isfinite(a).all() and a.min() >= 0
    # attention rows are a softmax average -> mean mass preserved
    np.testing.assert_allclose(a.sum(), 1.0, rtol=1e-3)


def test_attention_heatmap_and_tb_logging(tmp_path):
    img = np.random.RandomState(0).rand(16, 16).astype(np.float32)
    attn = np.random.RandomState(1).rand(4, 4).astype(np.float32)
    heat = attention_heatmap(img, attn)
    assert heat.shape == (16, 16, 3) and heat.dtype == np.uint8
    tb = TensorBoardVisualizer(tmp_path)
    tb.log_attention("attn/bottleneck", img, attn, step=1)
    tb.log_similarity("sim", img, {"sim_0": attn}, step=1)
    tb.close()
    assert any(tmp_path.iterdir())
