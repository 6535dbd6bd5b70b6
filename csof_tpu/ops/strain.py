"""Perimeter-based tangential strain + contour tracking error.

Capability parity with the reference's strain analysis
(ref: nnunet/save_strain.py:9-35 `get_strain` — RV = label 1, endo = label 3,
epi = label 2 ∪ 3, strain_t = (P_t - P_0) / P_0 * 100, LV = (endo + epi)/2;
ref: nnunet/get_strain.py:63-174 contour tracking by warping GT contour
points through accumulated flows).

The perimeter estimator reproduces the classic weighted border-pixel-count
algorithm (as in skimage.measure.perimeter, neighbourhood=4) in pure jnp so
whole (T, H, W) label stacks evaluate on device in one call.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.ops.warp import warp_points

_SQRT2 = math.sqrt(2.0)


def perimeter(binary: jnp.ndarray) -> jnp.ndarray:
    """Estimate the total perimeter of objects in a 2D binary mask.

    Weighted border-pixel-category count (Vossepoel–Smeulders weights, the
    algorithm behind skimage.measure.perimeter with 4-neighbourhood): border
    pixels are classified by a 3x3 convolution with kernel
    [[10,2,10],[2,1,2],[10,2,10]] and weighted 1 / sqrt2 / (1+sqrt2)/2.

    Accuracy: exact on 45-degree diamonds, consistent +4-5% on circles at
    all radii (the estimator family's known bias) — strain, a perimeter
    RATIO relative to frame 0 (ref: save_strain.py:25-28), cancels it.
    """
    b = binary.astype(jnp.float32)
    # 4-neighbourhood erosion: pixel survives if itself and the 4-cross are set
    bp = jnp.pad(b, 1, constant_values=0.0)
    center = bp[1:-1, 1:-1]
    up, down = bp[:-2, 1:-1], bp[2:, 1:-1]
    left, right = bp[1:-1, :-2], bp[1:-1, 2:]
    eroded = center * up * down * left * right
    border = b - eroded  # pixels removed by erosion

    kernel = jnp.array([[10.0, 2.0, 10.0], [2.0, 1.0, 2.0], [10.0, 2.0, 10.0]])
    pb = jnp.pad(border, 1, constant_values=0.0)
    cat = jax.lax.conv_general_dilated(
        pb[None, ..., None],
        kernel[..., None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, ..., 0]
    cat = jnp.round(cat).astype(jnp.int32) * jnp.round(border).astype(jnp.int32)

    weights = np.zeros(50, np.float32)
    weights[[5, 7, 15, 17, 25, 27]] = 1.0
    weights[[21, 33]] = _SQRT2
    weights[[13, 23]] = (1.0 + _SQRT2) / 2.0
    w = jnp.asarray(weights)
    hist = jnp.zeros(50, jnp.float32).at[jnp.clip(cat.reshape(-1), 0, 49)].add(1.0)
    # category 0 collects non-border pixels; its weight is 0 so no correction needed
    return jnp.dot(w, hist)


perimeter_batch = jax.vmap(perimeter)


def strain_curves(label_seq: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Tangential strain curves from a (T, H, W) label sequence
    (ref: save_strain.py:9-35). Labels: 1=RV, 2=MYO, 3=LV-endo.

    Returns {'rv': (T,), 'lv': (T,)} in percent relative to frame 0.
    """
    rv = perimeter_batch((label_seq == 1))
    endo = perimeter_batch((label_seq == 3))
    epi = perimeter_batch((label_seq == 2) | (label_seq == 3))
    eps = 1e-8

    def rel(p):
        return (p - p[0]) / (p[0] + eps) * 100.0

    rv_s, endo_s, epi_s = rel(rv), rel(endo), rel(epi)
    return {"rv": rv_s, "lv": (endo_s + epi_s) / 2.0}


def _mean_nn_distance(a_pts: jnp.ndarray, b_pts: jnp.ndarray) -> jnp.ndarray:
    """Symmetric mean nearest-neighbour distance between two (P, 2) /
    (Q, 2) point sets (tile-padded sets are fine: duplicated points only
    reweight, and nearest-neighbour mins are duplicate-invariant for the
    uniformly-subsampled contours `extract_contour_points` emits)."""
    d2 = jnp.sum((a_pts[:, None, :] - b_pts[None, :, :]) ** 2, axis=-1)
    ab = jnp.mean(jnp.sqrt(jnp.min(d2, axis=1)))
    ba = jnp.mean(jnp.sqrt(jnp.min(d2, axis=0)))
    return (ab + ba) / 2.0


def myocardial_thickness(label_frame: np.ndarray, max_points: int = 256) -> float:
    """Mean LV wall thickness of one (H, W) label frame: symmetric mean
    nearest distance between the endocardial contour (border of label-3
    region) and the epicardial contour (border of label 2 ∪ 3). Contour
    extraction is host-side (data-dependent point counts); the pairwise
    distance reduction runs on device over fixed-size point sets."""
    endo = extract_contour_points(np.asarray(label_frame) == 3, max_points)
    epi = extract_contour_points(
        (np.asarray(label_frame) == 2) | (np.asarray(label_frame) == 3), max_points
    )
    if not endo.any() or not epi.any():
        return float("nan")
    return float(_mean_nn_distance(jnp.asarray(endo), jnp.asarray(epi)))


def radial_strain_curve(label_seq: np.ndarray, max_points: int = 256) -> np.ndarray:
    """LV radial strain from a (T, H, W) label sequence: relative change of
    mean myocardial wall thickness vs frame 0, in percent.

    The reference's radial LV strain curves (`Sradial_LV_curve`,
    ref: compute_strain_curve_metric.py:30-31, compute_stats_strain.py:26-28)
    are produced by the Medis clinical package and only *read* from .mat —
    the repo had no mask-based radial implementation. This is the standard
    wall-thickening definition: radial_t = (th_t - th_0) / th_0 * 100, where
    th is the endo↔epi mean contour distance. Positive during systole
    (wall thickens as the cavity contracts), like Medis radial strain."""
    th = np.array([myocardial_thickness(f, max_points) for f in np.asarray(label_seq)])
    eps = 1e-8
    return (th - th[0]) / (th[0] + eps) * 100.0


def track_contour(points0: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """Track contour points through a sequence of accumulated backward flows.

    points0: (P, 2) frame-0 contour points; flows: (T, H, W, 2) where
    flows[t] maps frame t coordinates back to frame 0 — points are advected
    with each frame's *cumulative* field, matching `from_ed_accumulation`
    (ref: get_strain.py:63-174).

    Returns (T, P, 2) tracked points (frame 0 = points0).
    """
    return jax.vmap(lambda f: warp_points(points0, f))(flows)


def contour_tracking_error(tracked: jnp.ndarray, gt_points: jnp.ndarray) -> jnp.ndarray:
    """Mean symmetric nearest-neighbour distance per frame between tracked
    (T, P, 2) and ground-truth (T, Q, 2) contours."""

    def one(a, b):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        ab = jnp.mean(jnp.sqrt(jnp.min(d2, axis=1)))
        ba = jnp.mean(jnp.sqrt(jnp.min(d2, axis=0)))
        return (ab + ba) / 2.0

    return jax.vmap(one)(tracked, gt_points)


def extract_contour_points(mask: np.ndarray, max_points: int = 256) -> np.ndarray:
    """Host-side: border pixels of a binary mask as (P, 2) float coords,
    padded/subsampled to `max_points` (static shape for jit)."""
    from scipy.ndimage import binary_erosion

    border = mask & ~binary_erosion(mask, np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool))
    pts = np.argwhere(border).astype(np.float32)
    if len(pts) == 0:
        return np.zeros((max_points, 2), np.float32)
    if len(pts) >= max_points:
        sel = np.linspace(0, len(pts) - 1, max_points).astype(int)
        return pts[sel]
    reps = int(np.ceil(max_points / len(pts)))
    return np.tile(pts, (reps, 1))[:max_points]
