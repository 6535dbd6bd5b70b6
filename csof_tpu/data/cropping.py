"""Nonzero-bounding-box cropping of raw cases.

Capability of the reference's `ImageCropper` stage
(ref: nnunet/preprocessing/cropping.py:26-220 — `create_nonzero_mask`,
`get_bbox_from_mask`, `crop_to_nonzero`, `ImageCropper`): crop each case to
the union nonzero bbox across modalities, mark outside-bbox voxels in the seg
channel as -1 (the nonzero mask used later for normalization), and save
`.npz` (data+seg stacked) + `.pkl` properties.
"""

from __future__ import annotations

import pickle
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np
from scipy.ndimage import binary_fill_holes

from csof_tpu.utils.nifti import load_nifti


def create_nonzero_mask(data: np.ndarray) -> np.ndarray:
    """(c, *spatial) -> bool mask: union over channels of filled nonzero
    regions (ref: cropping.py:26-38)."""
    assert data.ndim in (3, 4)
    mask = np.zeros(data.shape[1:], dtype=bool)
    for c in range(data.shape[0]):
        mask |= data[c] != 0
    return binary_fill_holes(mask)


def get_bbox_from_mask(mask: np.ndarray, outside_value: float = 0) -> list[list[int]]:
    """Per-axis [min, max+1] bounds of the non-outside region
    (ref: cropping.py:48-62)."""
    coords = np.where(mask != outside_value)
    return [[int(c.min()), int(c.max()) + 1] for c in coords]


def crop_to_bbox(image: np.ndarray, bbox: list[list[int]]) -> np.ndarray:
    slicer = tuple(slice(b[0], b[1]) for b in bbox)
    return image[slicer]


def crop_to_nonzero(
    data: np.ndarray, seg: np.ndarray | None = None, nonzero_label: int = -1
):
    """Crop (c, *sp) data (+seg) to nonzero bbox; outside-mask voxels that are
    background in seg get `nonzero_label` (ref: cropping.py:105-143)."""
    nonzero_mask = create_nonzero_mask(data)
    bbox = get_bbox_from_mask(nonzero_mask, 0)
    data = np.stack([crop_to_bbox(data[c], bbox) for c in range(data.shape[0])])
    if seg is not None:
        seg = np.stack([crop_to_bbox(seg[c], bbox) for c in range(seg.shape[0])])
    mask = crop_to_bbox(nonzero_mask, bbox)
    if seg is not None:
        seg[(seg == 0) & (~mask[None])] = nonzero_label
    else:
        # inside mask -> 0, outside -> nonzero_label (ref: cropping.py:131-137)
        seg = np.where(mask, 0, nonzero_label).astype(np.float32)[None]
    return data, seg, bbox


def crop_case(
    data_files: list[str | Path], seg_file: str | Path | None = None
):
    """Load NIfTI modalities (+seg), stack to (c, z, y, x), crop to nonzero.

    Returns (data, seg, properties) with the same property keys the reference
    stores (ref: cropping.py:165-188): original_size_of_raw_data,
    original_spacing, itk geometry, crop_bbox, classes.
    """
    images = [load_nifti(f) for f in data_files]
    data = np.stack([im.data_czyx for im in images]).astype(np.float32)
    # load_nifti returns (z,y,x) per modality with spacing (z,y,x)
    properties = {
        "original_size_of_raw_data": np.array(data.shape[1:]),
        "original_spacing": np.array(images[0].spacing_zyx, dtype=float),
        "list_of_data_files": [str(f) for f in data_files],
        "seg_file": str(seg_file) if seg_file else None,
        "itk_origin": images[0].origin,
        "itk_spacing": images[0].itk_spacing,
        "itk_direction": images[0].direction,
        "nifti_affine": images[0].affine,
    }
    seg = None
    if seg_file is not None:
        seg = load_nifti(seg_file).data_czyx[None].astype(np.float32)
    shape_before = data.shape
    data, seg, bbox = crop_to_nonzero(data, seg, nonzero_label=-1)
    properties["crop_bbox"] = bbox
    properties["classes"] = np.unique(seg)
    properties["size_after_cropping"] = data[0].shape
    seg[seg < -1] = 0
    return data, seg, properties


def _crop_one(args):
    case_id, data_files, seg_file, out_dir, overwrite = args
    out_npz = Path(out_dir) / f"{case_id}.npz"
    out_pkl = Path(out_dir) / f"{case_id}.pkl"
    if out_npz.exists() and out_pkl.exists() and not overwrite:
        return case_id
    data, seg, props = crop_case(data_files, seg_file)
    all_data = np.vstack([data, seg]).astype(np.float32)
    np.savez_compressed(out_npz, data=all_data)
    with open(out_pkl, "wb") as f:
        pickle.dump(props, f)
    return case_id


def run_cropping(
    cases: list[tuple[str, list[str], str | None]],
    out_dir: str | Path,
    num_workers: int = 8,
    overwrite: bool = False,
) -> list[str]:
    """Crop all cases (list of (case_id, modality_files, seg_file)) in
    parallel (ref: cropping.py:289-310 `run_cropping` with mp.Pool)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    jobs = [(cid, files, seg, out_dir, overwrite) for cid, files, seg in cases]
    if num_workers <= 1:
        return [_crop_one(j) for j in jobs]
    with ProcessPoolExecutor(max_workers=num_workers) as ex:
        return list(ex.map(_crop_one, jobs))
