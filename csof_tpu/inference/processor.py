"""Heart-ROI processor: segment -> centroid -> fixed crop -> uncrop.

Capability parity with ref: nnunet/training/network_training/processor.py:
9-237 (`Processor`): a pretrained 2D "cropping network" (or any mask source)
segments the frame, LV/global centroids come from the mask bounding boxes
(`get_fixed_info:38` via masks_to_boxes), a fixed-size crop window is
clamped to the image borders (`adjust_cropping_window:109`), optional
per-frame translation alignment (`get_translation:53`, `translate:78`), and
`uncrop:162`/`uncrop_no_registration:178` pad predictions back to the full
FOV. Extended `Processor2` adds strain distance maps
(ref: processor2.py:273 `get_strain_mask`).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from scipy.ndimage import distance_transform_edt


def mask_centroid(mask: np.ndarray) -> tuple[float, float]:
    """Center of the mask bbox (the reference uses torchvision
    masks_to_boxes then box centers)."""
    if not mask.any():
        return (mask.shape[0] / 2, mask.shape[1] / 2)
    ys, xs = np.where(mask)
    return ((ys.min() + ys.max()) / 2.0, (xs.min() + xs.max()) / 2.0)


def adjust_cropping_window(center_y: float, center_x: float, image_hw, crop_size: int):
    """Clamp a crop window center so the window fits inside the image
    (ref: processor.py:109-160)."""
    h, w = image_hw
    half = crop_size / 2.0
    cy = min(max(center_y, half), max(h - half, half))
    cx = min(max(center_x, half), max(w - half, half))
    y0 = int(round(cy - half))
    x0 = int(round(cx - half))
    y0 = max(0, min(y0, max(h - crop_size, 0)))
    x0 = max(0, min(x0, max(w - crop_size, 0)))
    return y0, x0


class Processor:
    """crop_size-square heart ROI cropping around a segmentation centroid."""

    def __init__(self, crop_size: int = 128, cropping_network: Callable[[np.ndarray], np.ndarray] | None = None):
        self.crop_size = crop_size
        self.cropping_network = cropping_network

    def get_mask(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W). Returns a binary heart mask (via the cropping
        network's argmax > 0, ref: processor.py `discretize:140`)."""
        if self.cropping_network is None:
            # fallback: intensity-otsu-ish central mass
            thr = image.mean() + image.std()
            return image > thr
        seg = self.cropping_network(image)
        return np.asarray(seg) > 0

    def crop(self, frames: np.ndarray, mask: np.ndarray | None = None):
        """frames: (T, H, W) (or (H, W)); ROI window computed from `mask` (or
        the first frame's predicted mask), shared by all frames.

        Returns (cropped (T, cs, cs), window_record)."""
        single = frames.ndim == 2
        if single:
            frames = frames[None]
        h, w = frames.shape[-2:]
        cs = self.crop_size
        if mask is None:
            mask = self.get_mask(frames[0])
        cy, cx = mask_centroid(np.asarray(mask, bool))
        y0, x0 = adjust_cropping_window(cy, cx, (h, w), cs)
        # window may exceed the image if image < crop_size: pad
        pad_y = max(cs - h, 0)
        pad_x = max(cs - w, 0)
        padded = np.pad(frames, ((0, 0), (0, pad_y), (0, pad_x)))
        out = padded[:, y0 : y0 + cs, x0 : x0 + cs]
        record = {"y0": y0, "x0": x0, "orig_hw": (h, w), "crop_size": cs}
        return (out[0] if single else out), record

    def uncrop(self, cropped: np.ndarray, record: dict, fill=0.0) -> np.ndarray:
        """Pad a (..., cs, cs) prediction back to the full FOV
        (ref: processor.py:162-196 `uncrop_no_registration`)."""
        h, w = record["orig_hw"]
        cs = record["crop_size"]
        out_shape = (*cropped.shape[:-2], max(h, record["y0"] + cs), max(w, record["x0"] + cs))
        out = np.full(out_shape, fill, dtype=cropped.dtype)
        out[..., record["y0"] : record["y0"] + cs, record["x0"] : record["x0"] + cs] = cropped
        return out[..., :h, :w]

    # -- translation alignment (ref: processor.py:53-108) -------------------

    @staticmethod
    def get_translation(mask_ref: np.ndarray, mask_t: np.ndarray) -> tuple[float, float]:
        cy0, cx0 = mask_centroid(mask_ref)
        cy1, cx1 = mask_centroid(mask_t)
        return (cy0 - cy1, cx0 - cx1)

    @staticmethod
    def translate(image: np.ndarray, dy: float, dx: float) -> np.ndarray:
        """Integer-pixel translation with zero fill."""
        dy, dx = int(round(dy)), int(round(dx))
        out = np.zeros_like(image)
        h, w = image.shape[-2:]
        ys_src = slice(max(0, -dy), min(h, h - dy))
        xs_src = slice(max(0, -dx), min(w, w - dx))
        ys_dst = slice(max(0, dy), min(h, h + dy))
        xs_dst = slice(max(0, dx), min(w, w + dx))
        out[..., ys_dst, xs_dst] = image[..., ys_src, xs_src]
        return out

    # -- strain distance maps (ref: processor2.py:273) ----------------------

    @staticmethod
    def get_strain_mask(seg: np.ndarray, label: int, power: float = 1.0) -> np.ndarray:
        """Normalized inverse-distance map to the structure boundary."""
        mask = seg == label
        if not mask.any():
            return np.zeros_like(seg, np.float32)
        dist = distance_transform_edt(~_boundary(mask))
        dist = dist.astype(np.float32)
        dmax = dist.max() if dist.max() > 0 else 1.0
        return (1.0 - dist / dmax) ** power


def _boundary(mask: np.ndarray) -> np.ndarray:
    from scipy.ndimage import binary_erosion

    return mask & ~binary_erosion(mask)
