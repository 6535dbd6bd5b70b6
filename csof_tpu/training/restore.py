"""Model restore: rebuild a trainer/predictor from a results folder.

Capability parity with ref: nnunet/training/model_restore.py:23-130
(`restore_model` rebuilds the trainer class from the `model.pkl` init-args
sidecar via reflection; `load_model_and_checkpoint_files:109`). Here the
sidecar is explicit: `config.yaml` (experiment config) + `plans.json`
(+ `meta.json`) written at training time — no reflection.
"""

from __future__ import annotations

import json
from pathlib import Path

from csof_tpu.config.experiment import ExperimentConfig, load_experiment_config
from csof_tpu.config.plans import Plans
from csof_tpu.training import checkpoint as ckpt
from csof_tpu.training.trainer import Trainer


def save_trainer_sidecar(folder: str | Path, config: ExperimentConfig, plans: Plans | None, num_classes: int):
    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    config.to_yaml(folder / "config.yaml")
    if plans is not None:
        plans.to_json(folder / "plans.json")
    (folder / "meta.json").write_text(json.dumps({"num_classes": num_classes}))


def load_pretrained_weights(params, pretrained_params, verbose: bool = False):
    """Shape-checked partial weight transfer: copy every leaf whose path AND
    shape match; keep the fresh init elsewhere
    (ref: nnunet/run/load_pretrained_weights.py:62)."""
    import jax

    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    loaded, skipped = 0, 0
    out = {}
    for path, leaf in flat_new.items():
        old = flat_old.get(path)
        if old is not None and getattr(old, "shape", None) == leaf.shape:
            out[path] = old
            loaded += 1
        else:
            out[path] = leaf
            skipped += 1
            if verbose and old is not None:
                print(f"skip {path}: {getattr(old, 'shape', None)} != {leaf.shape}")
    treedef = jax.tree_util.tree_structure(params)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    if verbose:
        print(f"pretrained transfer: {loaded} loaded, {skipped} kept from init")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_trainer(
    folder: str | Path, example_batch: dict, checkpoint_name: str | None = None, mesh=None
) -> Trainer:
    folder = Path(folder)
    config = load_experiment_config(folder / "config.yaml")
    plans = Plans.from_json(folder / "plans.json") if (folder / "plans.json").exists() else None
    meta = json.loads((folder / "meta.json").read_text()) if (folder / "meta.json").exists() else {}
    trainer = Trainer(
        config, folder, plans=plans, num_classes=meta.get("num_classes"), mesh=mesh,
        example_batch=example_batch,
    )
    trainer.load_checkpoint(checkpoint_name)
    return trainer
