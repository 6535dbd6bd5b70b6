"""Preprocessor: crop -> transpose -> resample -> normalize -> save.

Capability parity with the reference's `GenericPreprocessor`
(ref: nnunet/preprocessing/preprocessing.py:202-520 — `run`,
`resample_and_normalize:236-321`, `preprocess_test_case:323`; 2D variant
`PreprocessorFor2D:699`). Output contract matches: per-case
`<id>.npz` (data+seg stacked float32) + `<id>.pkl` properties carrying
`size_after_resampling`/`spacing_after_resampling`/crop bbox/geometry.
"""

from __future__ import annotations

import pickle
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from csof_tpu.config.plans import Plans
from csof_tpu.data.cropping import crop_case
from csof_tpu.ops.normalize import normalize_case
from csof_tpu.ops.resample import resample_patient


class Preprocessor:
    def __init__(self, plans: Plans, stage: int = 0):
        self.plans = plans
        self.stage = stage

    def run_case(
        self,
        data: np.ndarray,
        seg: np.ndarray | None,
        properties: dict,
        force_separate_z: bool | None = None,
    ):
        """(c, z, y, x) cropped arrays -> preprocessed (resampled+normalized)."""
        sp = self.plans.stage(self.stage)
        tf = list(self.plans.transpose_forward[: data.ndim - 1])
        data = data.transpose([0] + [1 + i for i in tf])
        if seg is not None:
            seg = seg.transpose([0] + [1 + i for i in tf])
        original_spacing = np.array(properties["original_spacing"])[tf]
        target_spacing = np.array(sp.current_spacing)
        if len(target_spacing) == 2:  # 2D plans keep z untouched
            target_spacing = np.array([original_spacing[0], *sp.current_spacing])

        data = np.nan_to_num(data)
        data, seg = resample_patient(
            data, seg, original_spacing, target_spacing,
            order_data=3, order_seg=1, force_separate_z=force_separate_z,
            order_z_data=0, order_z_seg=0,
        )
        if seg is not None:
            seg[seg < -1] = 0
        properties = dict(properties)
        properties["size_after_resampling"] = data[0].shape
        properties["spacing_after_resampling"] = tuple(float(s) for s in target_spacing)

        data = normalize_case(
            data,
            self.plans.normalization_schemes,
            self.plans.use_mask_for_norm,
            seg=seg,
            intensity_properties=self.plans.intensity_properties,
        )
        if seg is not None:
            # sampled per-class foreground voxel coordinates for the 33%
            # oversampling patch sampler (the reference stores the same
            # 'class_locations' in the properties pkl during preprocessing)
            rng = np.random.RandomState(1234)
            class_locations = {}
            for c in self.plans.all_classes:
                coords = np.argwhere(seg[0] == c)
                if len(coords) > 10_000:
                    coords = coords[rng.choice(len(coords), 10_000, replace=False)]
                class_locations[int(c)] = coords
            properties["class_locations"] = class_locations
        return data, seg, properties

    def run_case_from_files(self, data_files, seg_file, force_separate_z=None):
        data, seg, properties = crop_case(data_files, seg_file)
        return self.run_case(data, seg, properties, force_separate_z)

    # -- folder-level -------------------------------------------------------

    def _one(self, args):
        case_id, cropped_dir, out_dir = args
        arr = np.load(Path(cropped_dir) / f"{case_id}.npz")["data"]
        with open(Path(cropped_dir) / f"{case_id}.pkl", "rb") as f:
            properties = pickle.load(f)
        nmod = self.plans.num_modalities
        data, seg, properties = self.run_case(arr[:nmod], arr[nmod:], properties)
        all_data = np.vstack([data, seg]).astype(np.float32)
        np.savez_compressed(Path(out_dir) / f"{case_id}.npz", data=all_data)
        with open(Path(out_dir) / f"{case_id}.pkl", "wb") as f:
            pickle.dump(properties, f)
        return case_id

    def run(self, cropped_dir: str | Path, out_dir: str | Path, num_workers: int = 4):
        cropped_dir, out_dir = Path(cropped_dir), Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        cases = sorted(p.stem for p in cropped_dir.glob("*.npz"))
        jobs = [(c, cropped_dir, out_dir) for c in cases]
        if num_workers <= 1:
            return [self._one(j) for j in jobs]
        with ProcessPoolExecutor(max_workers=num_workers) as ex:
            return list(ex.map(self._one, jobs))
