"""Resampling / normalization / pad-crop / cropping / NIfTI round-trips."""

import numpy as np
import pytest

from csof_tpu.data.cropping import crop_to_nonzero, create_nonzero_mask, get_bbox_from_mask
from csof_tpu.ops.normalize import normalize_case, normalize_modality
from csof_tpu.ops.padcrop import center_pad_or_crop, invert_center_pad_or_crop, pad_nd_image
from csof_tpu.ops.resample import (
    compute_new_shape,
    get_do_separate_z,
    get_lowres_axis,
    resample_patient,
    resize_segmentation,
    spline_resize,
)
from csof_tpu.utils.nifti import NiftiImage, load_nifti, save_nifti


def test_spline_resize_identity_and_constant():
    x = np.random.RandomState(0).rand(9, 11).astype(np.float32)
    np.testing.assert_allclose(spline_resize(x, (9, 11), order=3), x)
    const = np.full((8, 8), 3.5)
    out = spline_resize(const, (16, 16), order=3)
    np.testing.assert_allclose(out, 3.5, rtol=1e-6)


def test_spline_resize_linear_ramp_preserved():
    # order-1 resize of a linear ramp stays linear (half-pixel alignment)
    x = np.arange(16, dtype=float)[:, None] * np.ones((1, 4))
    out = spline_resize(x, (32, 4), order=1)
    # interior should be a ramp with slope 0.5
    diffs = np.diff(out[2:-2, 0])
    np.testing.assert_allclose(diffs, 0.5, atol=1e-6)


def test_resize_segmentation_labels_preserved():
    seg = np.zeros((12, 12), dtype=np.int16)
    seg[3:9, 3:9] = 2
    seg[5:7, 5:7] = 1
    out = resize_segmentation(seg, (24, 24), order=1)
    assert set(np.unique(out)) <= {0, 1, 2}
    assert out[12, 12] == 1
    assert out[8, 8] == 2
    assert out[0, 0] == 0


def test_separate_z_decision():
    assert get_do_separate_z((5.0, 1.0, 1.0))
    assert not get_do_separate_z((1.5, 1.0, 1.0))
    assert list(get_lowres_axis((5.0, 1.0, 1.0))) == [0]
    assert list(get_lowres_axis((5.0, 5.0, 1.0))) == [0, 1]


def test_resample_patient_shapes_and_seg_integrity():
    rng = np.random.RandomState(0)
    data = rng.rand(1, 8, 24, 24).astype(np.float32)
    seg = (rng.rand(1, 8, 24, 24) > 0.7).astype(np.float32)
    # anisotropic: z spacing 5 vs 1 -> separate-z path
    d2, s2 = resample_patient(data, seg, (5.0, 1.0, 1.0), (5.0, 0.5, 0.5), force_separate_z=None)
    assert d2.shape == (1, 8, 48, 48)
    assert s2.shape == (1, 8, 48, 48)
    assert set(np.unique(s2)) <= {0.0, 1.0}
    # isotropic path
    d3, s3 = resample_patient(data, seg, (1.0, 1.0, 1.0), (0.5, 0.5, 0.5), force_separate_z=None)
    assert d3.shape == (1, 16, 48, 48)
    assert compute_new_shape((8, 24, 24), (1, 1, 1), (0.5, 0.5, 0.5)).tolist() == [16, 48, 48]


def test_normalize_zscore_and_mask():
    rng = np.random.RandomState(1)
    x = rng.rand(30, 30).astype(np.float32) * 10 + 5
    out = normalize_modality(x, "zscore")
    assert abs(out.mean()) < 1e-4 and abs(out.std() - 1) < 1e-3
    seg = np.full((1, 30, 30), -1.0)
    seg[0, 10:20, 10:20] = 0
    outm = normalize_case(x[None], {0: "zscore"}, {0: True}, seg=seg)
    assert outm[0, 0, 0] == 0  # outside mask zeroed
    inside = outm[0, 10:20, 10:20]
    assert abs(inside.mean()) < 1e-3


def test_normalize_ct():
    x = np.linspace(-1000, 1000, 64 * 64).reshape(64, 64).astype(np.float32)
    props = {"mean": 0.0, "sd": 100.0, "percentile_00_5": -200.0, "percentile_99_5": 200.0}
    out = normalize_modality(x, "CT", intensity_properties=props)
    assert out.min() == pytest.approx(-2.0)
    assert out.max() == pytest.approx(2.0)


def test_pad_nd_image_and_slicer():
    x = np.random.RandomState(0).rand(3, 10, 13)
    padded, slicer = pad_nd_image(x, (16, 16), return_slicer=True)
    assert padded.shape == (3, 16, 16)
    np.testing.assert_array_equal(padded[slicer], x)
    p2 = pad_nd_image(x, None, shape_must_be_divisible_by=(8, 8))
    assert p2.shape == (3, 16, 16)


def test_center_pad_or_crop_roundtrip():
    x = np.random.RandomState(0).rand(2, 20, 9)
    out, rec = center_pad_or_crop(x, (12, 16))
    assert out.shape == (2, 12, 16)
    back = invert_center_pad_or_crop(out, rec)
    assert back.shape == x.shape
    # the cropped region is lost; the padded region must round-trip exactly
    np.testing.assert_array_equal(back[:, 4:16, :], x[:, 4:16, :])


def test_crop_to_nonzero():
    data = np.zeros((1, 10, 12, 12), dtype=np.float32)
    data[0, 2:8, 3:9, 4:10] = 1.0
    seg = np.zeros((1, 10, 12, 12), dtype=np.float32)
    seg[0, 4:6, 5:7, 5:7] = 2.0
    d, s, bbox = crop_to_nonzero(data, seg)
    assert bbox == [[2, 8], [3, 9], [4, 10]]
    assert d.shape == (1, 6, 6, 6)
    assert (s >= -1).all() and 2.0 in s
    # no seg provided: mask channel synthesized
    d2, s2, _ = crop_to_nonzero(data, None)
    assert s2.shape == (1, 6, 6, 6)
    assert set(np.unique(s2)) <= {-1.0, 0.0}


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    vol = (rng.rand(5, 7, 9) * 100).astype(np.float32)
    affine = np.diag([1.5, 2.0, 3.0, 1.0])
    affine[:3, 3] = (10, -5, 2)
    p = tmp_path / "x.nii.gz"
    save_nifti(vol, p, affine=affine)
    img = load_nifti(p)
    np.testing.assert_allclose(img.data_czyx, vol, rtol=1e-6)
    np.testing.assert_allclose(img.affine, affine, rtol=1e-5)
    assert img.itk_spacing == pytest.approx((1.5, 2.0, 3.0))
    assert img.spacing_zyx == pytest.approx((3.0, 2.0, 1.5))
    # 4D round-trip
    vol4 = (rng.rand(3, 4, 5, 6)).astype(np.float32)
    p4 = tmp_path / "y.nii"
    save_nifti(vol4, p4, affine=affine)
    img4 = load_nifti(p4)
    np.testing.assert_allclose(img4.data_czyx, vol4, rtol=1e-6)
    # integer dtype preserved
    seg = (rng.rand(5, 7, 9) > 0.5).astype(np.uint8)
    ps = tmp_path / "s.nii.gz"
    save_nifti(seg, ps, affine=affine)
    imgs = load_nifti(ps)
    assert imgs.data_czyx.dtype == np.uint8
    np.testing.assert_array_equal(imgs.data_czyx, seg)
