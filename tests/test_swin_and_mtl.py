"""Swin blocks + MTL model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.models.mtl import MTLConfig, MTLModel
from csof_tpu.models.swin import (
    SwinBlock,
    SwinStage,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_unpartition,
)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(16, 16, 8).astype(np.float32))
    wins = window_partition(x, 4)
    assert wins.shape == (16, 16, 8)
    back = window_unpartition(wins, 4, 16, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49  # (2*4-1)^2
    assert (np.diag(idx) == idx[0, 0]).all()  # self-offsets identical


def test_shifted_window_mask_blocks():
    mask = shifted_window_mask(8, 8, 4, 2)
    m = np.asarray(mask)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m < -1e8).any()


def test_swin_block_forward():
    x = jnp.asarray(np.random.RandomState(0).rand(16, 16, 16).astype(np.float32))
    blk = SwinBlock(dim=16, num_heads=2, window=4, shift=2)
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == (16, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mtl_conv_and_swin_encoders():
    for enc in ("conv", "swin"):
        cfg = MTLConfig(
            out_encoder_dims=(8, 16), encoder=enc, swin_depths=(1, 1), swin_heads=(2, 2),
            window=4, bottleneck_layers=1, bottleneck_heads=2, dim_feedforward=32,
            reconstruction=True, directional_field=True,
        )
        model = MTLModel(cfg, num_classes=4)
        x = jnp.zeros((16, 16, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out["seg_logits"].shape == (16, 16, 4)
        assert out["reconstruction"].shape == (16, 16, 1)
        assert out["directional_field"].shape == (16, 16, 2)
