"""Flagship-width sharded training step on the 8-device CPU mesh.

`__graft_entry__.dryrun_multichip` runs the production Trainer + shardings
at TINY shapes (16^2, T=2, d_model 8) — it validates the sharding program,
not the flagship model. This slow-tier test executes ONE sharded train
step with the FULL flagship channel widths (out_encoder_dims 32/64/128,
d_model 128 — the dims that drive layouts, collectives and param
shardings), T=6 per the reference's video_length, B=8 split over the
8-device data axis. Ref DDP counterpart: nnUNetTrainerV2_DDP.py:74-116.

Spatial size is 64^2, NOT the serving 128^2: measured on this image
(round 5 bisect), the XLA:CPU runtime hard-aborts any sharded program
whose collective rendezvous spread exceeds a HARDCODED 40 s
(rendezvous.cc "Termination timeout ... Exiting to ensure a consistent
program state"), and at 128^2 the 8 virtual-device threads on the single
physical core cannot all reach the in-step all-gather in time
(64^2/T6 passes; 128^2/T3 dies). 128^2 sharded execution is therefore
only validatable on real multi-chip hardware; this test pins everything
else. f32 on CPU (bf16 is emulated and ~4x slower there).
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_flagship_width_sharded_train_step(tmp_path):
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
        data=DataConfig(video_length=6, batch_size=8, crop_size=64),
        max_num_epochs=1,
        num_batches_per_epoch=1,
        num_val_batches_per_epoch=1,
    )
    rng = np.random.RandomState(0)
    b, t, hw = 8, 6, 64
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
