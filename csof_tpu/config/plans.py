"""Experiment *plans*: the data/architecture contract.

The reference stores plans as an untyped pickled dict produced by its
experiment planner and re-parsed by every trainer
(ref: nnunet/training/network_training/nnUNetTrainer.py:477-546 `process_plans`;
ref: nnunet/experiment_planning/experiment_planner_baseline_3DUNet.py:249
`plan_experiment`). Here plans are a typed dataclass with JSON round-trip
(plus legacy-pickle import) so the contract is explicit and versionable.
"""

from __future__ import annotations

import json
import pickle
from dataclasses import dataclass, field, asdict
from pathlib import Path
from typing import Any, Sequence


@dataclass
class StagePlans:
    """Per-resolution-stage architecture/data geometry
    (ref: nnUNetTrainer.py:485-510)."""

    batch_size: int
    patch_size: tuple[int, ...]
    current_spacing: tuple[float, ...]
    original_spacing: tuple[float, ...]
    # one entry per downsampling step, each a per-axis stride list
    pool_op_kernel_sizes: list[list[int]]
    # one entry per resolution level (n_pool + 1), per-axis conv kernel
    conv_kernel_sizes: list[list[int]]
    do_dummy_2D_data_aug: bool = False
    median_patient_size_in_voxels: tuple[int, ...] | None = None

    @property
    def num_pool(self) -> int:
        return len(self.pool_op_kernel_sizes)

    @property
    def ndim(self) -> int:
        return len(self.patch_size)


@dataclass
class Plans:
    """Task-level plans (ref: nnUNetTrainer.py:513-546)."""

    task: str
    num_modalities: int
    num_classes: int  # foreground classes, background excluded (ref adds +1)
    all_classes: list[int]
    normalization_schemes: dict[int, str]  # per-modality: "zscore" | "ct" | "noNorm"
    use_mask_for_norm: dict[int, bool]
    transpose_forward: tuple[int, ...]
    transpose_backward: tuple[int, ...]
    base_num_features: int = 32
    conv_per_stage: int = 2
    plans_per_stage: dict[int, StagePlans] = field(default_factory=dict)
    intensity_properties: dict[int, dict[str, float]] | None = None
    data_identifier: str = "csof"
    keep_only_largest_region: Any = None
    min_region_size_per_class: Any = None
    modalities: dict[int, str] = field(default_factory=dict)

    @property
    def num_classes_with_background(self) -> int:
        return self.num_classes + 1

    @property
    def fullres_stage_id(self) -> int:
        """Highest-resolution stage (cascade plans: {0: lowres, 1: fullres},
        ref convention)."""
        return max(self.plans_per_stage)

    def fullres_stage(self) -> StagePlans:
        return self.plans_per_stage[self.fullres_stage_id]

    def stage(self, stage: int | None = None) -> StagePlans:
        if stage is None:
            if len(self.plans_per_stage) != 1:
                raise ValueError(
                    "stage must be given when plans contain multiple stages "
                    f"(found {sorted(self.plans_per_stage)})"
                )
            stage = next(iter(self.plans_per_stage))
        return self.plans_per_stage[stage]

    # -- serialization ------------------------------------------------------

    def to_json(self, path: str | Path) -> None:
        d = asdict(self)
        d["plans_per_stage"] = {str(k): v for k, v in d["plans_per_stage"].items()}
        for key in ("normalization_schemes", "use_mask_for_norm", "modalities"):
            d[key] = {str(k): v for k, v in d[key].items()}
        if d.get("intensity_properties"):
            d["intensity_properties"] = {str(k): v for k, v in d["intensity_properties"].items()}
        Path(path).write_text(json.dumps(d, indent=2, default=_jsonify))

    @classmethod
    def from_json(cls, path: str | Path) -> "Plans":
        d = json.loads(Path(path).read_text())
        d["plans_per_stage"] = {
            int(k): StagePlans(**_tuplify_stage(v)) for k, v in d["plans_per_stage"].items()
        }
        for key in ("normalization_schemes", "use_mask_for_norm", "modalities"):
            d[key] = {int(k): v for k, v in d.get(key, {}).items()}
        if d.get("intensity_properties"):
            d["intensity_properties"] = {int(k): v for k, v in d["intensity_properties"].items()}
        d["transpose_forward"] = tuple(d["transpose_forward"])
        d["transpose_backward"] = tuple(d["transpose_backward"])
        return cls(**d)

    @classmethod
    def from_reference_pickle(cls, path: str | Path, task: str | None = None) -> "Plans":
        """Import a legacy nnU-Net `*_plans_{2D,3D}.pkl` (the reference's
        on-disk contract) into the typed form."""
        with open(path, "rb") as f:
            p = pickle.load(f)
        stages = {}
        for k, sp in p["plans_per_stage"].items():
            stages[int(k)] = StagePlans(
                batch_size=int(sp["batch_size"]),
                patch_size=tuple(int(x) for x in sp["patch_size"]),
                current_spacing=tuple(float(x) for x in sp["current_spacing"]),
                original_spacing=tuple(float(x) for x in sp["original_spacing"]),
                pool_op_kernel_sizes=[list(map(int, x)) for x in sp["pool_op_kernel_sizes"]],
                conv_kernel_sizes=[list(map(int, x)) for x in sp["conv_kernel_sizes"]],
                do_dummy_2D_data_aug=bool(sp.get("do_dummy_2D_data_aug", False)),
                median_patient_size_in_voxels=tuple(
                    int(x) for x in sp.get("median_patient_size_in_voxels", ())
                ) or None,
            )
        norm = {int(k): v for k, v in dict(p["normalization_schemes"]).items()}
        return cls(
            task=task or str(p.get("dataset_properties", {}).get("task", "unknown")),
            num_modalities=int(p["num_modalities"]),
            num_classes=int(p["num_classes"]),
            all_classes=[int(c) for c in p["all_classes"]],
            normalization_schemes=norm,
            use_mask_for_norm={int(k): bool(v) for k, v in dict(p["use_mask_for_norm"]).items()},
            transpose_forward=tuple(p.get("transpose_forward", (0, 1, 2))),
            transpose_backward=tuple(p.get("transpose_backward", (0, 1, 2))),
            base_num_features=int(p.get("base_num_features", 32)),
            conv_per_stage=int(p.get("conv_per_stage", 2)),
            plans_per_stage=stages,
            intensity_properties=p.get("dataset_properties", {}).get("intensityproperties"),
            modalities={int(k): v for k, v in dict(p.get("modalities", {})).items()},
        )


def _jsonify(o):
    import numpy as np

    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, Path):
        return str(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


def _tuplify_stage(d: dict) -> dict:
    d = dict(d)
    for k in ("patch_size", "current_spacing", "original_spacing"):
        d[k] = tuple(d[k])
    if d.get("median_patient_size_in_voxels"):
        d["median_patient_size_in_voxels"] = tuple(d["median_patient_size_in_voxels"])
    return d
