"""LR finder, pretrained transfer, region-based evaluation."""

import jax
import numpy as np
import pytest

from csof_tpu.evaluation.region_based import CARDIAC_REGIONS, evaluate_regions
from csof_tpu.training.restore import load_pretrained_weights


def test_load_pretrained_weights_partial():
    import jax.numpy as jnp
    from csof_tpu.models.unet import GenericUNet

    net_a = GenericUNet(num_classes=2, base_num_features=4,
                        pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                        deep_supervision=False)
    net_b = GenericUNet(num_classes=3, base_num_features=4,  # different head
                        pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
                        deep_supervision=False)
    pa = net_a.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    pb = net_b.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 1)))
    merged = load_pretrained_weights(pb, pa)
    # matching-shape leaves transferred
    a_leaf = jax.tree.leaves(pa)[0]
    m_leaf = jax.tree.leaves(merged)[0]
    np.testing.assert_allclose(np.asarray(m_leaf), np.asarray(a_leaf))
    # mismatched head kept from fresh init (shape differs)
    shapes_b = [x.shape for x in jax.tree.leaves(pb)]
    shapes_m = [x.shape for x in jax.tree.leaves(merged)]
    assert shapes_b == shapes_m


def test_find_lr_runs():
    from csof_tpu.config.experiment import ExperimentConfig, OptimConfig
    from csof_tpu.training.trainer import Trainer

    cfg = ExperimentConfig(model="unet2d", max_num_epochs=1, num_batches_per_epoch=1,
                           num_val_batches_per_epoch=1,
                           optim=OptimConfig(optimizer="sgd"))
    rng = np.random.RandomState(0)

    def batches():
        while True:
            x = rng.rand(8, 16, 16, 1).astype(np.float32)
            y = (x[..., 0] > 0.5).astype(np.int32)
            yield {"data": x, "seg": y}

    it = batches()
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(cfg, tmp, num_classes=2, example_batch=next(it))
        lr, lrs, losses = tr.find_lr(it, num_iters=25)
        assert lr > 0 and len(lrs) == len(losses) > 5


def test_region_based_evaluation():
    gt = np.zeros((20, 20), np.uint8)
    gt[2:10, 2:10] = 1
    gt[12:18, 2:10] = 2
    gt[12:18, 12:18] = 3
    pred = gt.copy()
    pred[2, 2] = 0
    res = evaluate_regions(pred, gt, CARDIAC_REGIONS)
    assert 0.9 < res["whole_heart"]["Dice"] <= 1.0
    assert res["LV"]["Dice"] == 1.0
    assert np.isfinite(res["LV_epi"]["HD95"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Optional orbax backend: same triad contract, async save supported."""
    import numpy as np

    from csof_tpu.training import checkpoint as ckpt

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int32(7)}
    ckpt.save_checkpoint_orbax(tmp_path, state, ckpt.FINAL, meta={"epoch": 3})
    restored, meta = ckpt.load_checkpoint_orbax(
        tmp_path, {"params": {"w": np.zeros((2, 3), np.float32)}, "step": np.int32(0)}
    )
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 7
    assert meta["epoch"] == 3

    # async save: handle must be waitable and produce a loadable checkpoint
    handle = ckpt.save_checkpoint_orbax(tmp_path, state, ckpt.BEST, async_save=True)
    handle.wait_until_finished()
    restored2, _ = ckpt.load_checkpoint_orbax(
        tmp_path, {"params": {"w": np.zeros((2, 3), np.float32)}, "step": np.int32(0)},
        name=ckpt.BEST,
    )
    np.testing.assert_array_equal(restored2["params"]["w"], state["params"]["w"])
