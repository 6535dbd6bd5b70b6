"""Flagship-geometry sharded training step on the 8-device CPU mesh.

`__graft_entry__.dryrun_multichip` runs the production Trainer + shardings
at TINY shapes (16^2, T=2, d_model 8) — it validates the sharding program,
not the flagship geometry. This slow-tier test executes ONE sharded train
step at the real serving/training geometry (128^2 ROI, T=6 per the
reference's video_length, B=8 split over the 8-device data axis) so a
shape-dependent sharding bug (e.g. an uneven-split collective or a
lane-padding blowup that only appears at 128^2) cannot hide behind the
tiny dry run. Ref DDP counterpart: nnUNetTrainerV2_DDP.py:74-116.

f32 on CPU (bf16 is emulated and ~4x slower there); the TPU path runs the
same program in bf16 via the Trainer defaults.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_flagship_geometry_sharded_train_step(tmp_path):
    import jax

    from csof_tpu.config.experiment import (
        DataConfig,
        ExperimentConfig,
        SegFlowModelConfig,
    )
    from csof_tpu.parallel.mesh import make_mesh
    from csof_tpu.training.trainer import Trainer

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=8, n_model=1)

    config = ExperimentConfig(
        model="segflow",
        segflow=SegFlowModelConfig(dtype="float32"),  # flagship dims
        data=DataConfig(video_length=6, batch_size=8, crop_size=128),
        max_num_epochs=1,
        num_batches_per_epoch=1,
        num_val_batches_per_epoch=1,
    )
    rng = np.random.RandomState(0)
    b, t, hw = 8, 6, 128
    batch = {
        "video": rng.rand(b, t, hw, hw, 1).astype(np.float32),
        "seg": np.where(
            rng.rand(b, t, hw, hw) > 0.7, rng.randint(0, 4, (b, t, hw, hw)), -1
        ).astype(np.int32),
        "labeled_mask": np.ones((b, t), np.float32),
    }
    trainer = Trainer(config, tmp_path, num_classes=4, mesh=mesh, example_batch=batch)
    # the global batch must actually ride the 8-way data axis
    assert trainer.mesh.shape["data"] == 8
    loss, aux = trainer.run_iteration(batch, train=True)
    assert np.isfinite(loss)
    assert int(trainer.state.step) == 1
