"""Trainer + mesh/sharding tests on the 8-device virtual CPU mesh."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.config.experiment import (
    DataConfig,
    ExperimentConfig,
    OptimConfig,
    SegFlowModelConfig,
)
from csof_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from csof_tpu.training import checkpoint as ckpt
from csof_tpu.training.schedules import build_optimizer, poly_schedule
from csof_tpu.training.trainer import Trainer


def test_mesh_and_sharding():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == batch_sharding(mesh).spec


def test_poly_schedule_matches_reference_formula():
    s = poly_schedule(0.01, 1000, 0.9)
    assert s(0) == pytest.approx(0.01)
    assert s(500) == pytest.approx(0.01 * (0.5**0.9))


def seg_config():
    return ExperimentConfig(
        model="unet2d",
        max_num_epochs=2,
        num_batches_per_epoch=3,
        num_val_batches_per_epoch=2,
        deep_supervision=True,
        optim=OptimConfig(optimizer="sgd", scheduler="poly", initial_lr=0.05),
    )


def seg_batches(batch=8):
    rng = np.random.RandomState(0)
    while True:
        x = rng.rand(batch, 16, 16, 1).astype(np.float32)
        y = np.zeros((batch, 16, 16), np.int32)
        y[:, 4:12, 4:12] = 1
        x[:, 4:12, 4:12, 0] += 2.0
        yield {"data": x, "seg": y}


@pytest.mark.slow
def test_seg_trainer_runs_and_improves(tmp_path):
    cfg = seg_config()
    it = seg_batches()
    tr = Trainer(cfg, tmp_path, num_classes=2, example_batch=next(it))
    # shrink the model for test speed
    hist = tr.run_training(it, seg_batches(), log_fn=lambda s: None)
    assert len(hist.train_losses) == 2
    assert hist.train_losses[-1] <= hist.train_losses[0] + 0.05
    assert (tmp_path / ckpt.FINAL).exists()
    assert hist.eval_metrics, "online fg-dice must be tracked"


def test_debug_information_dump(tmp_path):
    """debug.json + network_architecture.txt observability parity
    (ref: nnUNetTrainer.py:447-463; network_trainer.py:425)."""
    import json

    cfg = seg_config()
    it = seg_batches()
    tr = Trainer(cfg, tmp_path, num_classes=2, example_batch=next(it))
    tr.save_debug_information()
    dct = json.loads((tmp_path / "debug.json").read_text())
    assert dct["model_class"] == "GenericUNet"
    assert dct["num_parameters"] > 0
    assert dct["config"]["model"] == "unet2d"
    assert dct["trainer_constants"]["patience"] == 50
    arch = (tmp_path / "network_architecture.txt").read_text()
    assert "total params" in arch and "kernel" in arch


def test_checkpoint_roundtrip(tmp_path):
    cfg = seg_config()
    it = seg_batches()
    tr = Trainer(cfg, tmp_path, num_classes=2, example_batch=next(it))
    tr.run_iteration(next(it))
    tr.epoch = 7
    tr.save_checkpoint(ckpt.LATEST)
    p_before = jax.device_get(tr.state.params)

    tr2 = Trainer(cfg, tmp_path, num_classes=2, example_batch=next(it))
    meta = tr2.load_checkpoint(ckpt.LATEST)
    assert tr2.epoch == 7
    p_after = jax.device_get(tr2.state.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=0), p_before, p_after)


def test_segflow_trainer_step(tmp_path):
    cfg = ExperimentConfig(
        model="segflow",
        max_num_epochs=1,
        num_batches_per_epoch=2,
        num_val_batches_per_epoch=1,
        segflow=SegFlowModelConfig(
            out_encoder_dims=(8, 16),
            d_model=16,
            bottleneck_heads=2,
            dim_feedforward=32,
            corr_radius=(2, 2),
            corr_stride=(1, 1),
            dtype="float32",
        ),
        data=DataConfig(video_length=3, batch_size=8),
    )

    def batches():
        rng = np.random.RandomState(0)
        while True:
            video = rng.rand(8, 3, 16, 16, 1).astype(np.float32)
            seg = -np.ones((8, 3, 16, 16), np.int32)
            seg[:, 0] = 1
            mask = np.zeros((8, 3), np.float32)
            mask[:, 0] = 1
            yield {"video": video, "seg": seg, "labeled_mask": mask}

    it = batches()
    tr = Trainer(cfg, tmp_path, num_classes=4, example_batch=next(it))
    loss, aux = tr.run_iteration(next(it))
    assert np.isfinite(loss)
    assert "ncc" in aux and np.isfinite(float(aux["ncc"]))


def test_voxelmorph_3d_trainer_step(tmp_path):
    """3D registration through the full Trainer (jit-sharded step): the
    voxelmorph path is rank-polymorphic, so (B, D, H, W, C) batches train
    directly (ref 3D flow decoders: lib/decoder_alt.py:1284, 2203)."""
    from csof_tpu.config.experiment import VoxelMorphModelConfig

    cfg = ExperimentConfig(
        model="voxelmorph",
        max_num_epochs=1,
        num_batches_per_epoch=2,
        num_val_batches_per_epoch=1,
        voxelmorph=VoxelMorphModelConfig(
            enc_features=(4, 8, 8), dec_features=(8, 8, 4, 4),
            diffeomorphic=True, int_steps=4, dtype="float32",
        ),
        data=DataConfig(batch_size=2),
    )

    def batches():
        rng = np.random.RandomState(0)
        while True:
            moving = rng.rand(2, 8, 16, 16, 1).astype(np.float32)
            fixed = rng.rand(2, 8, 16, 16, 1).astype(np.float32)
            yield {"moving": moving, "fixed": fixed}

    it = batches()
    tr = Trainer(cfg, tmp_path, num_classes=4, example_batch=next(it))
    loss, aux = tr.run_iteration(next(it))
    assert np.isfinite(loss)
    assert np.isfinite(float(aux["ncc"])) and np.isfinite(float(aux["smooth"]))


def test_momentum_rescue_trigger(tmp_path):
    """The V2 epoch-100 momentum rescue (ref: nnUNetTrainerV2.py:424-434):
    degenerate online dice at the rescue epoch drops SGD momentum to 0.95,
    reinitializes the weights, and keeps the schedule position."""
    import dataclasses

    cfg = dataclasses.replace(
        seg_config(),
        optim=OptimConfig(
            optimizer="sgd", scheduler="poly", initial_lr=0.05,
            momentum_rescue_epoch=100,
        ),
    )
    it = seg_batches()
    tr = Trainer(cfg, tmp_path, num_classes=2, example_batch=next(it))
    tr.run_iteration(next(it))  # advance a step so step-preservation is visible
    old_step = int(tr.state.step)
    old_params = jax.device_get(tr.state.params)

    # not the rescue epoch -> no-op
    tr.epoch = 99
    tr.history.eval_metrics.append(0.0)
    assert not tr._maybe_momentum_rescue(lambda s: None)

    # rescue epoch but dice is fine -> no-op
    tr.epoch = 100
    tr.history.eval_metrics.append(0.5)
    assert not tr._maybe_momentum_rescue(lambda s: None)
    assert tr.config.optim.sgd_momentum == 0.99

    # rescue epoch + degenerate dice -> momentum drop + weight reinit
    tr.history.eval_metrics.append(0.0)
    msgs = []
    assert tr._maybe_momentum_rescue(msgs.append)
    assert tr.config.optim.sgd_momentum == 0.95
    assert int(tr.state.step) == old_step, "LR schedule position preserved"
    new_params = jax.device_get(tr.state.params)
    diffs = [
        float(np.abs(a - b).max())
        for a, b in zip(
            jax.tree.leaves(old_params), jax.tree.leaves(new_params)
        )
    ]
    assert max(diffs) > 0, "weights must be reinitialized"
    assert msgs and "momentum" in msgs[0]
    # the trainer still steps after the rebuild (new tx retraces cleanly)
    loss, _ = tr.run_iteration(next(it))
    assert np.isfinite(loss)

    # adamw / disabled configs never trigger
    cfg2 = dataclasses.replace(seg_config(), optim=OptimConfig(optimizer="adamw"))
    tr2 = Trainer(cfg2, tmp_path / "b", num_classes=2, example_batch=next(it))
    tr2.epoch = 100
    tr2.history.eval_metrics.append(0.0)
    assert not tr2._maybe_momentum_rescue(lambda s: None)
