"""Worker for the multi-process jax.distributed tests (run by
tests/test_distributed_multiprocess.py, one subprocess per rank).

Exercises the real multi-host code path of scripts/train_tpu_pod.sh on
localhost CPU: jax.distributed rendezvous, a global ("data", "model") mesh
spanning the processes' devices (each process contributes
--xla_force_host_platform_device_count virtual devices, so 2 procs x 4
devices exercises process-SPANNING data sharding, not just 1 device/rank),
per-process local-shard feeding through `shard_batch`
(jax.make_array_from_process_local_data), the jit-sharded train step with
its implicit cross-process gradient psum, the in-step global batch-dice
reduction, and rank-0-only checkpoint/log IO
(ref: nnUNetTrainerV2_DDP.py:67 env-rendezvous init, :74-116 per-rank
batch split, :118-128 rank-0 IO).

Run single-process (num_procs=1) it trains on the CONCATENATED global
batch instead — the ground truth the multi-process run must reproduce.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")

LOCAL_BATCH = 4  # samples per rank (= global batch 8 at 2 procs)
N_ITERS = 3


def rank_batches(seed):
    import numpy as np

    rng = np.random.RandomState(seed)
    while True:
        data = rng.rand(LOCAL_BATCH, 16, 16, 1).astype(np.float32)
        seg = rng.randint(0, 3, (LOCAL_BATCH, 16, 16)).astype(np.int32)
        yield {"data": data, "seg": seg}


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]
    num_procs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    if num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}", num_processes=num_procs, process_id=pid
        )
        assert jax.process_count() == num_procs
        assert len(jax.devices()) == num_procs * len(jax.local_devices())

    import numpy as np

    from csof_tpu.config.experiment import DataConfig, ExperimentConfig
    from csof_tpu.training.trainer import Trainer

    global_batch = 2 * LOCAL_BATCH  # always 2 ranks' worth of data
    cfg = ExperimentConfig(
        model="unet2d",
        max_num_epochs=1,
        num_batches_per_epoch=2,
        num_val_batches_per_epoch=1,
        deep_supervision=False,
        data=DataConfig(batch_size=global_batch, do_data_aug=False),
    )

    gens = {r: rank_batches(100 + r) for r in range(2)}

    def next_batch():
        if num_procs > 1:
            # this rank's LOCAL shard; the runtime assembles the global batch
            return next(gens[pid])
        # single-process ground truth: the same global batch, concatenated
        # in rank order
        shards = [next(gens[r]) for r in range(2)]
        return {k: np.concatenate([s[k] for s in shards]) for k in shards[0]}

    # identical parameter init on all ranks (same seed); data differs by rank
    tr = Trainer(cfg, out_dir, num_classes=3, example_batch=next_batch())
    expect_data = min(global_batch, len(jax.devices()))
    assert tr.mesh.shape["data"] == expect_data, f"mesh {tr.mesh.shape} != {expect_data}"

    losses = []
    for _ in range(N_ITERS):
        loss, _ = tr.run_iteration(next_batch())
        losses.append(loss)
    # one val step: aux carries the in-step GLOBAL batch-dice statistics
    # (parallel/mesh.py global_batch_dice_stats psum over the data axis)
    vloss, aux = tr.run_iteration(next_batch(), train=False)
    stats = np.concatenate([np.asarray(aux[k], np.float64).ravel() for k in ("tp", "fp", "fn")])
    # the loss is a global (psum'd) scalar: all ranks must agree bit-for-bit
    print(f"RANK{pid} LOSSES {' '.join(f'{l:.9f}' for l in losses)}", flush=True)
    print(f"RANK{pid} VAL {vloss:.9f} DICESTATS {' '.join(f'{s:.6f}' for s in stats)}", flush=True)

    tr.save_checkpoint()  # writes on rank 0 only
    print(f"RANK{pid} OK", flush=True)


if __name__ == "__main__":
    main()
