"""Experiment planning: choose spacing/patch/batch/pooling, emit Plans.

Capability parity with the reference's `ExperimentPlanner`
(ref: nnunet/experiment_planning/experiment_planner_baseline_3DUNet.py:34-420
— target-spacing selection, the memory-model patch-shrink loop at
`get_properties_for_stage:146`, normalization-scheme choice at
`determine_normalization_scheme:361`; pooling algorithm at
ref: nnunet/experiment_planning/common_utils.py:89-155
`get_pool_and_conv_props`; 2D planner variants at
experiment_planner_baseline_2DUNet*.py).

The "memory model" here is an HBM activation estimate of the csof U-Net
rather than the reference's empirical CUDA constant — same shrink-longest-
axis loop, TPU-calibrated budget.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from csof_tpu.config.plans import Plans, StagePlans

MIN_FEATURE_MAP_SIZE = 4  # ref: experiment_planner_baseline_3DUNet.py (unet_featuremap_min_edge_length)
MAX_NUMPOOL_3D = 5
MAX_NUMPOOL_2D = 6
DEFAULT_BATCH_3D = 2
DEFAULT_BATCH_2D = 12  # ref 2D planner derives ~12-50; we start at 12
MAX_FILTERS_2D = 480
MAX_FILTERS_3D = 320
ANISO_THRESHOLD = 3


def get_pool_and_conv_props(
    spacing, patch_size, min_feature_map_size=MIN_FEATURE_MAP_SIZE, max_numpool=999
):
    """Per-axis pooling/conv-kernel schedule (same algorithm as
    ref: common_utils.py:89-155): pool all axes whose current spacing is
    within 2x of the finest, until the min-feature-map or max-pool limits;
    conv kernels are 1 on axes still >2x coarser than the finest."""
    dim = len(spacing)
    cur_spacing = [float(s) for s in spacing]
    cur_size = [int(p) for p in patch_size]
    pool_kernels, conv_kernels = [], []
    num_pool_per_axis = [0] * dim

    while True:
        min_sp = min(cur_spacing)
        valid = [i for i in range(dim) if cur_spacing[i] / min_sp < 2]
        # conv kernel: 3 on the largest mutually-isotropic axis group
        axes = []
        for a in range(dim):
            partners = [
                i
                for i in range(dim)
                if cur_spacing[i] / cur_spacing[a] < 2 and cur_spacing[a] / cur_spacing[i] < 2
            ]
            if len(partners) > len(axes):
                axes = partners
        conv = [3 if i in axes else 1 for i in range(dim)]
        valid = [i for i in valid if cur_size[i] >= 2 * min_feature_map_size]
        valid = [i for i in valid if num_pool_per_axis[i] < max_numpool]
        if not valid:
            break
        pool = [1] * dim
        for v in valid:
            pool[v] = 2
            num_pool_per_axis[v] += 1
            cur_spacing[v] *= 2
            cur_size[v] = int(math.ceil(cur_size[v] / 2))
        pool_kernels.append(pool)
        conv_kernels.append(conv)

    conv_kernels.append([3] * dim)  # bottleneck level
    must_divide = [2**n for n in num_pool_per_axis]
    padded = pad_shape_to_divisible(patch_size, must_divide)
    return num_pool_per_axis, pool_kernels, conv_kernels, padded, must_divide


def pad_shape_to_divisible(shape, divisors):
    out = []
    for s, d in zip(shape, divisors):
        out.append(int(s) if s % d == 0 else int(s + d - s % d))
    return out


def activation_voxels(patch_size, pool_kernels, base_features, conv_per_stage, max_filters):
    """Rough activation volume (feature-map voxels x features) of the U-Net —
    the quantity the reference's VRAM model tracks
    (ref: generic_UNet.py compute_approx_vram_consumption)."""
    size = list(patch_size)
    feats = base_features
    total = np.prod(size) * feats * conv_per_stage * 2  # enc+dec at full res
    for pool in pool_kernels:
        size = [int(math.ceil(s / p)) for s, p in zip(size, pool)]
        feats = min(feats * 2, max_filters)
        total += np.prod(size) * feats * conv_per_stage * 2
    return float(total)


class ExperimentPlanner:
    """Produce 2D + 3D plans from `dataset_properties.pkl`."""

    def __init__(
        self,
        dataset_properties: dict,
        task: str,
        base_num_features: int = 32,
        conv_per_stage: int = 2,
        # HBM activation budget in voxel-features (calibrated for one v5e chip
        # at bf16 with rematerialization; the shrink loop mirrors
        # ref: get_properties_for_stage:146)
        budget_3d: float = 6.0e8,
        budget_2d: float = 1.6e8,
    ):
        self.props = dataset_properties
        self.task = task
        self.base_num_features = base_num_features
        self.conv_per_stage = conv_per_stage
        self.budget_3d = budget_3d
        self.budget_2d = budget_2d

    def target_spacing(self) -> np.ndarray:
        """Median spacing; anisotropic axes (>3x) use the 10th percentile
        (ref: experiment_planner_baseline_3DUNet.py:107-144)."""
        spacings = np.array(self.props["all_spacings"])
        target = np.median(spacings, axis=0)
        worst = np.argmax(target)
        if target[worst] / np.min(target) > ANISO_THRESHOLD:
            target[worst] = np.percentile(spacings[:, worst], 10)
        return target

    def median_shape_at(self, spacing: np.ndarray) -> np.ndarray:
        sizes = np.array(self.props["all_sizes"], float)
        spacings = np.array(self.props["all_spacings"], float)
        new_sizes = sizes * spacings / spacing[None, :]
        return np.round(np.median(new_sizes, axis=0)).astype(int)

    def _plan_stage(self, spacing, median_shape, is_2d: bool) -> StagePlans:
        max_numpool = MAX_NUMPOOL_2D if is_2d else MAX_NUMPOOL_3D
        max_filters = MAX_FILTERS_2D if is_2d else MAX_FILTERS_3D
        budget = self.budget_2d if is_2d else self.budget_3d
        if is_2d:
            spacing = spacing[-2:]
            patch = [int(s) for s in median_shape[-2:]]
        else:
            patch = [int(s) for s in median_shape]
        patch = [max(p, 2 * MIN_FEATURE_MAP_SIZE) for p in patch]

        prev_padded = None
        while True:
            _, pools, convs, padded, must_divide = get_pool_and_conv_props(
                spacing, patch, MIN_FEATURE_MAP_SIZE, max_numpool
            )
            vox = activation_voxels(
                padded, pools, self.base_num_features, self.conv_per_stage, max_filters
            )
            if vox <= budget or padded == prev_padded:
                break  # under budget, or shrunk to the floor on every axis
            prev_padded = padded
            # shrink the axis largest relative to the dataset median by one
            # divisibility unit (ref: get_properties_for_stage:146 subtracts
            # shape_must_be_divisible_by on the chosen axis)
            ref_shape = median_shape[-2:] if is_2d else median_shape
            rel = [p / m for p, m in zip(padded, ref_shape)]
            ax = int(np.argmax(rel))
            patch = list(padded)
            patch[ax] = max(patch[ax] - must_divide[ax], 2 * MIN_FEATURE_MAP_SIZE)

        batch = DEFAULT_BATCH_2D if is_2d else DEFAULT_BATCH_3D
        # grow batch while well under budget (capped at 5% dataset voxels like
        # the reference's batch_size_covers_max_percent_of_dataset)
        while vox * (batch + 1) <= budget * (3 if is_2d else 2) and batch < 64:
            batch += 1
        return StagePlans(
            batch_size=int(batch),
            patch_size=tuple(int(p) for p in padded),
            current_spacing=tuple(float(s) for s in spacing),
            original_spacing=tuple(float(s) for s in np.median(np.array(self.props["all_spacings"]), axis=0)),
            pool_op_kernel_sizes=pools,
            conv_kernel_sizes=convs,
            do_dummy_2D_data_aug=bool((not is_2d) and spacing[0] > ANISO_THRESHOLD * min(spacing)),
            median_patient_size_in_voxels=tuple(int(x) for x in (median_shape[-2:] if is_2d else median_shape)),
        )

    def plan(self, num_modalities: int, modality_names: dict[int, str] | None = None) -> dict[str, Plans]:
        spacing = self.target_spacing()
        median_shape = self.median_shape_at(spacing)
        schemes = {}
        modality_names = modality_names or {i: "MRI" for i in range(num_modalities)}
        for c in range(num_modalities):
            name = modality_names.get(c, "MRI")
            schemes[c] = "CT" if name == "CT" else ("noNorm" if name == "noNorm" else "zscore")
        # use_mask_for_norm: only if cropping shrank cases notably
        avg_reduction = float(np.mean(list(self.props.get("size_reductions", {1: 1.0}).values())))
        use_mask = {c: avg_reduction < 3 / 4 for c in range(num_modalities)}

        common = dict(
            task=self.task,
            num_modalities=num_modalities,
            num_classes=len(self.props["all_classes"]),
            all_classes=[int(c) for c in self.props["all_classes"]],
            normalization_schemes=schemes,
            use_mask_for_norm=use_mask,
            transpose_forward=(0, 1, 2),
            transpose_backward=(0, 1, 2),
            base_num_features=self.base_num_features,
            conv_per_stage=self.conv_per_stage,
            intensity_properties=self.props["intensityproperties"],
            modalities=modality_names,
        )
        fullres = self._plan_stage(spacing, median_shape, is_2d=False)
        stages3d = {0: fullres}
        # lowres cascade stage when the fullres patch covers too little of the
        # median volume (ref heuristic: ExperimentPlanner.plan_experiment adds
        # 3d_lowres when patch voxels < 1/4 of median shape; the lowres stage
        # coarsens spacing isotropically until the volume nears the patch)
        if np.prod(fullres.patch_size) * 4 < np.prod(median_shape):
            factor = (np.prod(median_shape) / (2.0 * np.prod(fullres.patch_size))) ** (1 / 3)
            low_spacing = spacing * factor
            low_shape = self.median_shape_at(low_spacing)
            lowres = self._plan_stage(low_spacing, low_shape, is_2d=False)
            stages3d = {0: lowres, 1: fullres}
        plans3d = Plans(
            plans_per_stage=stages3d,
            data_identifier="csof_3D",
            **common,
        )
        plans2d = Plans(
            plans_per_stage={0: self._plan_stage(spacing, median_shape, is_2d=True)},
            data_identifier="csof_2D",
            **common,
        )
        return {"2d": plans2d, "3d": plans3d}


def plan_and_write(dataset_properties: dict, task: str, out_dir: str | Path, num_modalities: int, modality_names=None):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    planner = ExperimentPlanner(dataset_properties, task)
    plans = planner.plan(num_modalities, modality_names)
    plans["2d"].to_json(out_dir / "plans_2D.json")
    plans["3d"].to_json(out_dir / "plans_3D.json")
    return plans
