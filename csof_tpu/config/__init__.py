"""Typed configuration layer.

Replaces the reference's three config layers (SURVEY.md §5 'Config / flag
system'): env-var paths (ref: nnunet/paths.py:19-58), pickled experiment
*plans* (ref: nnunet/training/network_training/nnUNetTrainer.py:477-546), and
the per-experiment YAML (ref: nnunet/video.yaml,
nnunet/lib/training_utils.py:459-485) — as plain dataclasses with YAML/JSON
round-trip, no reflection.
"""

from csof_tpu.config.paths import Paths, default_paths
from csof_tpu.config.plans import Plans, StagePlans
from csof_tpu.config.experiment import ExperimentConfig, load_experiment_config

__all__ = [
    "Paths",
    "default_paths",
    "Plans",
    "StagePlans",
    "ExperimentConfig",
    "load_experiment_config",
]
