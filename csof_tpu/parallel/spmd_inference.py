"""Multi-chip SPMD inference: shard the tile/slice batch over the mesh.

The reference parallelizes inference only by sharding the *case list* across
GPUs (ref: nnunet/inference/predict_simple.py --num_parts/--part_id). On a
TPU slice we can additionally shard WITHIN a case: the sliding-window tile
batch (or the cine depth-slice batch) lays out over the `data` mesh axis,
params are replicated, and XLA partitions the batched forward across chips —
no collectives needed until the host gathers the tiles back.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_batch_forward(
    apply_fn: Callable,
    mesh: Mesh,
    donate: bool = False,
):
    """Wrap `apply_fn(params, batch)` so the leading batch axis is sharded
    over `data` and params are replicated. The returned callable pads the
    batch up to a multiple of the data-axis size (masking is the caller's
    job — predictions for padded rows are discarded)."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    jitted = jax.jit(apply_fn, in_shardings=(rep, shard), out_shardings=shard)
    n_data = mesh.shape["data"]

    def run(params, batch: jnp.ndarray) -> jnp.ndarray:
        n = batch.shape[0]
        pad = (-n) % n_data
        if pad:
            batch = jnp.concatenate([batch, jnp.zeros((pad, *batch.shape[1:]), batch.dtype)])
        out = jitted(params, batch)
        return out[:n]

    return run


def sharded_tile_predict(
    apply_fn: Callable,
    params,
    tiles: np.ndarray,
    mesh: Mesh,
) -> np.ndarray:
    """One-shot helper: (n_tiles, *patch, C) -> (n_tiles, *patch, classes)
    softmax, computed with the tile batch spread over every chip."""
    run = make_sharded_batch_forward(
        lambda p, x: jax.nn.softmax(apply_fn(p, x), axis=-1), mesh
    )
    return np.asarray(run(params, jnp.asarray(tiles)))
