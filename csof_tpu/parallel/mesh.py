"""Device mesh + sharding helpers (data parallel over ICI, optional model axis).

TPU-native replacement for the reference's NCCL DDP
(ref: nnunet/training/network_training/nnUNetTrainerV2_DDP.py:67
`dist.init_process_group(backend='nccl')`; per-rank batch splitting at
:74-116). Here the global batch is laid out over the `data` mesh axis by
`jax.jit` shardings; XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build a ("data", "model") mesh. n_data == -1 uses all remaining
    devices; ICI-contiguous ordering is preserved (device order as given by
    jax, which enumerates the physical torus in ICI-neighbour order)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
        n_data = n // n_model
    assert n_data * n_model <= n
    dev_array = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of host arrays with the leading axis sharded over
    `data` (per-rank batch splitting of ref: nnUNetTrainerV2_DDP.py:74-116,
    done by the runtime instead of hand arithmetic).

    Multi-process (pod) path: each process passes its LOCAL batch shard and
    `jax.make_array_from_process_local_data` assembles the global array —
    the per-rank data split the reference does by slicing indices, done by
    the runtime instead."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def global_batch_dice_stats(tp: jnp.ndarray, fp: jnp.ndarray, fn: jnp.ndarray):
    """Sum per-class dice statistics over the whole (possibly sharded) batch.

    Inside a jitted, sharded step a plain `sum` over the batch axis IS the
    cross-device reduction (XLA lowers it to a psum over `data`) — this
    single line replaces the reference's custom autograd all-gather
    (ref: nnunet/utilities/distributed.py:27-48 `awesome_allgather_function`
    used at nnUNetTrainerV2_DDP.py:265-305)."""
    return jnp.sum(tp, axis=0), jnp.sum(fp, axis=0), jnp.sum(fn, axis=0)
