"""Checkpointing: latest/best/final triad + init-args sidecar.

Parity with the reference's checkpoint contract
(ref: nnunet/training/network_training/network_trainer.py:305-335
`save_checkpoint` — epoch, net/optimizer state, loss curves, best-criterion
state; files model_{latest,best,final_checkpoint}.model + `.pkl` sidecar of
init args enabling reconstruction, ref: nnunet/training/model_restore.py:44).

Format: flax msgpack for the pytree (portable, mmap-friendly) + JSON sidecar.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

LATEST = "model_latest.msgpack"
BEST = "model_best.msgpack"
FINAL = "model_final_checkpoint.msgpack"


def save_checkpoint(
    folder: str | Path,
    state: Any,
    name: str = LATEST,
    meta: dict | None = None,
) -> Path:
    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    path = folder / name
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(serialization.to_bytes(state))
    tmp.replace(path)
    if meta is not None:
        (folder / (name + ".json")).write_text(json.dumps(_jsonable(meta), indent=2))
    return path


def load_checkpoint(folder: str | Path, template: Any, name: str | None = None):
    """Restore into `template` (a pytree with the right structure). With no
    name, falls back final -> latest -> best, the reference's chain
    (ref: network_trainer.py:379-386 `load_best_checkpoint` fallbacks)."""
    folder = Path(folder)
    names = [name] if name else [FINAL, LATEST, BEST]
    for n in names:
        p = folder / n
        if p.exists():
            state = serialization.from_bytes(template, p.read_bytes())
            meta_p = folder / (n + ".json")
            meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
            return state, meta
    raise FileNotFoundError(f"no checkpoint among {names} in {folder}")


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, multi-host-safe checkpointing for large
# states. The msgpack triad above is the default (portable single files, no
# extra deps at runtime); orbax adds background saves (training continues
# while the previous state serializes) and per-array ocdbt storage that
# scales to sharded multi-host states. Env: CSOF_CKPT_BACKEND=orbax, or call
# these directly.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(
    folder: str | Path, state: Any, name: str = LATEST, meta: dict | None = None,
    async_save: bool = False,
):
    """Write `state` under folder/<name>.orbax (plus the same JSON sidecar
    as the msgpack path). With async_save, returns an orbax AsyncCheckpointer
    whose .wait_until_finished() must be called before process exit."""
    import orbax.checkpoint as ocp

    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    path = (folder / (name + ".orbax")).resolve()
    ckptr = (
        ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        if async_save
        else ocp.Checkpointer(ocp.StandardCheckpointHandler())
    )
    ckptr.save(path, jax.device_get(state), force=True)
    if meta is not None:
        (folder / (name + ".json")).write_text(json.dumps(_jsonable(meta), indent=2))
    return ckptr if async_save else None


def load_checkpoint_orbax(folder: str | Path, template: Any, name: str | None = None):
    """Orbax twin of load_checkpoint with the same final->latest->best
    fallback chain."""
    import orbax.checkpoint as ocp

    folder = Path(folder)
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    for n in [name] if name else [FINAL, LATEST, BEST]:
        p = (folder / (n + ".orbax")).resolve()
        if p.exists():
            state = ckptr.restore(p, args=ocp.args.StandardRestore(jax.device_get(template)))
            meta_p = folder / (n + ".json")
            meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
            return state, meta
    raise FileNotFoundError(f"no orbax checkpoint in {folder}")


def _jsonable(o):
    if isinstance(o, dict):
        return {k: _jsonable(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_jsonable(v) for v in o]
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return o
