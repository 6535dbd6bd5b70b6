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
