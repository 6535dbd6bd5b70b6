"""Worker for the 2-process jax.distributed test (run by
tests/test_distributed_multiprocess.py, one subprocess per rank).

Exercises the real multi-host code path of scripts/train_tpu_pod.sh on
localhost CPU: jax.distributed rendezvous, a global ("data", "model") mesh
spanning both processes, per-process local-shard feeding through
`shard_batch` (jax.make_array_from_process_local_data), the jit-sharded
train step with its implicit cross-process gradient psum, and rank-0-only
checkpoint/log IO (ref: nnUNetTrainerV2_DDP.py:67 env-rendezvous init,
:74-116 per-rank batch split, :118-128 rank-0 IO)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    import numpy as np

    from csof_tpu.config.experiment import DataConfig, ExperimentConfig
    from csof_tpu.training.trainer import Trainer

    cfg = ExperimentConfig(
        model="unet2d",
        max_num_epochs=1,
        num_batches_per_epoch=2,
        num_val_batches_per_epoch=1,
        deep_supervision=False,
        data=DataConfig(batch_size=2, do_data_aug=False),
    )

    def batches(seed):
        rng = np.random.RandomState(seed)
        while True:
            # LOCAL shard: 1 sample/process -> global batch 2
            data = rng.rand(1, 16, 16, 1).astype(np.float32)
            seg = rng.randint(0, 3, (1, 16, 16)).astype(np.int32)
            yield {"data": data, "seg": seg}

    # identical parameter init on both ranks (same seed); data differs by rank
    tr = Trainer(cfg, out_dir, num_classes=3, example_batch=next(batches(100 + pid)))
    assert tr.mesh.shape["data"] == 2, f"mesh should span both processes: {tr.mesh.shape}"

    it = batches(100 + pid)
    losses = []
    for _ in range(3):
        loss, _ = tr.run_iteration(next(it))
        losses.append(loss)
    # the loss is a global (psum'd) scalar: both ranks must agree bit-for-bit
    print(f"RANK{pid} LOSSES {' '.join(f'{l:.9f}' for l in losses)}", flush=True)

    tr.save_checkpoint()  # writes on rank 0 only
    print(f"RANK{pid} OK", flush=True)


if __name__ == "__main__":
    main()
