"""Mesh/sharding layer — replaces the reference's DP/DDP+NCCL stack.

The reference's two parallelism strategies (`nn.DataParallel`,
torch DDP over NCCL; ref: nnunet/training/network_training/
nnUNetTrainerV2_DP.py:33, nnUNetTrainerV2_DDP.py:67-308 and
nnunet/utilities/distributed.py:27 `awesome_allgather_function`) map here to
one `jax.sharding.Mesh` + jit-sharded train steps: gradient all-reduce is
XLA-inserted, and the DDP trainer's explicit all-gather of dice statistics
becomes an in-step cross-device sum (see
:func:`csof_tpu.parallel.mesh.global_batch_dice_stats`).
"""

from csof_tpu.parallel.mesh import (
    batch_sharding,
    global_batch_dice_stats,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "global_batch_dice_stats",
]
