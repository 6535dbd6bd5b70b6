"""Offline data plane end-to-end: phantom ACDC -> convert -> crop -> analyze
-> plan -> preprocess -> loaders."""

import numpy as np
import pytest

from csof_tpu.data.analysis import analyze_dataset
from csof_tpu.data.conversion.acdc import convert_acdc, make_synthetic_acdc, read_info_cfg
from csof_tpu.data.cropping import run_cropping
from csof_tpu.data.dataset import do_split, load_case, load_dataset, unpack_dataset
from csof_tpu.data.loaders import Prefetcher, SegPatchLoader, VideoChunkLoader, sample_video_chunk
from csof_tpu.data.planning import ExperimentPlanner, get_pool_and_conv_props
from csof_tpu.data.preprocessing import Preprocessor


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc")
    raw = make_synthetic_acdc(root / "raw", num_patients=3, num_frames=6, shape_zyx=(4, 40, 40))
    task = root / "task"
    dj = convert_acdc(raw, task)
    # crop
    cases = []
    for item in dj["training"]:
        case = item["image"].split("/")[-1].replace(".nii.gz", "")
        cases.append(
            (
                case,
                [str(task / "imagesTr" / f"{case}_0000.nii.gz")],
                str(task / "labelsTr" / f"{case}.nii.gz"),
            )
        )
    cropped = root / "cropped"
    run_cropping(cases, cropped, num_workers=1)
    props = analyze_dataset(cropped, num_modalities=1, num_workers=1)
    planner = ExperimentPlanner(props, "TaskSynth", budget_2d=2e7, budget_3d=2e7)
    plans = planner.plan(num_modalities=1)
    pre_dir = root / "preprocessed"
    pre = Preprocessor(plans["2d"])
    pre.run(cropped, pre_dir, num_workers=1)
    return {
        "root": root, "raw": raw, "task": task, "cropped": cropped,
        "props": props, "plans": plans, "pre_dir": pre_dir, "dataset_json": dj,
    }


def test_conversion_layout(pipeline):
    dj = pipeline["dataset_json"]
    assert dj["numTraining"] == 6  # 3 patients x ED/ES
    info = read_info_cfg(pipeline["raw"] / "patient001" / "Info.cfg")
    assert info["ED"] == "1"
    assert (pipeline["task"] / "cine" / "patient001_4d.nii.gz").exists()


def test_analysis_properties(pipeline):
    props = pipeline["props"]
    assert props["all_classes"] == [1, 2, 3]
    assert 0 in props["intensityproperties"]
    assert len(props["all_sizes"]) == 6
    # spacing read back from NIfTI in (z, y, x)
    assert props["all_spacings"][0] == pytest.approx((5.0, 1.5, 1.5))


def test_planner_output(pipeline):
    plans2d = pipeline["plans"]["2d"]
    sp = plans2d.stage(0)
    assert sp.ndim == 2
    assert all(p % (2 ** sum(k[i] == 2 for k in sp.pool_op_kernel_sizes)) == 0
               for i, p in enumerate(sp.patch_size))
    assert plans2d.num_classes == 3
    plans3d = pipeline["plans"]["3d"]
    sp3 = plans3d.stage(0)
    assert sp3.ndim == 3
    # strongly anisotropic z (5.0 vs 1.5) must not be pooled as often
    z_pools = sum(k[0] == 2 for k in sp3.pool_op_kernel_sizes)
    xy_pools = sum(k[1] == 2 for k in sp3.pool_op_kernel_sizes)
    assert z_pools < xy_pools


def test_pool_props_isotropic():
    npa, pools, convs, patch, div = get_pool_and_conv_props((1.0, 1.0), (64, 64), 4, 6)
    assert npa == [4, 4]  # 64 -> 32 -> 16 -> 8 -> 4 (stop: < 2*min_feature_map)
    assert all(p == [2, 2] for p in pools)
    assert len(convs) == len(pools) + 1
    assert patch == [64, 64]


def test_preprocessed_contract(pipeline):
    ds = load_dataset(pipeline["pre_dir"])
    assert len(ds) == 6
    unpack_dataset(pipeline["pre_dir"])
    data, props = load_case(next(iter(ds.values())))
    assert data.ndim == 4 and data.shape[0] == 2  # 1 modality + seg
    assert "size_after_resampling" in props
    assert "class_locations" in props and 3 in props["class_locations"]
    # z-scored foreground
    assert abs(float(np.asarray(data[0]).mean())) < 1.0


def test_split_determinism(pipeline):
    ds = load_dataset(pipeline["pre_dir"])
    tr1, va1 = do_split(list(ds), fold=0)
    tr2, va2 = do_split(list(ds), fold=0)
    assert tr1 == tr2 and va1 == va2
    assert set(tr1).isdisjoint(va1)
    assert len(tr1) + len(va1) == 6


def test_seg_patch_loader(pipeline):
    ds = load_dataset(pipeline["pre_dir"])
    plans = pipeline["plans"]["2d"]
    sp = plans.stage(0)
    loader = SegPatchLoader(ds, sp.patch_size, batch_size=4, num_modalities=1, seed=0)
    batch = next(loader)
    assert batch["data"].shape == (4, *sp.patch_size, 1)
    assert batch["seg"].shape == (4, *sp.patch_size)
    assert batch["seg"].min() >= 0
    # oversampled items should frequently contain foreground
    fg_frac = sum((next(loader)["seg"] > 0).any(axis=(1, 2)).mean() for _ in range(5)) / 5
    assert fg_frac > 0.3


def test_video_chunk_sampling_invariants():
    rng = np.random.RandomState(0)
    for _ in range(50):
        t = rng.randint(5, 20)
        ed, es = rng.randint(t), rng.randint(t)
        if ed == es:
            continue
        idx, mask, dist = sample_video_chunk(t, ed, es, 5, rng)
        assert len(idx) == 5 and mask.sum() >= 2
        assert idx[0] == ed and idx[-1] == es
        assert mask[0] and mask[-1]
        assert dist.shape == (5,)


def test_video_loader(pipeline):
    from csof_tpu.utils.nifti import load_nifti

    videos = {}
    for pdir in sorted(pipeline["raw"].glob("patient*")):
        info = read_info_cfg(pdir / "Info.cfg")
        cine = load_nifti(pdir / f"{pdir.name}_4d.nii.gz").data_czyx  # (t,z,y,x)
        videos[pdir.name] = {"frames": cine, "seg": None, "ed": int(info["ED"]) - 1,
                             "es": int(info["ES"]) - 1}
    loader = VideoChunkLoader(videos, video_length=4, batch_size=2, crop_size=32, seed=0)
    batch = next(loader)
    assert batch["video"].shape == (2, 4, 32, 32, 1)
    assert batch["video"].min() >= 0 and batch["video"].max() <= 1.0 + 1e-6
    assert batch["seg"].shape == (2, 4, 32, 32)
    assert (batch["labeled_mask"] == 0).all()  # no seg supplied
    pf = Prefetcher(loader, depth=2)
    b2 = next(pf)
    assert b2["video"].shape == (2, 4, 32, 32, 1)
    pf.close()


def test_lowres_cascade_stage_added():
    """A large dataset (relative to patch budget) gets a 3d_lowres stage."""
    import numpy as np
    from csof_tpu.data.planning import ExperimentPlanner

    props = {
        "all_sizes": [(160, 320, 320)] * 4,
        "all_spacings": [(1.0, 1.0, 1.0)] * 4,
        "all_classes": [1, 2],
        "intensityproperties": {0: {"mean": 0, "sd": 1, "percentile_00_5": -1, "percentile_99_5": 1,
                                    "median": 0, "mn": -1, "mx": 1}},
        "size_reductions": {"a": 1.0},
    }
    planner = ExperimentPlanner(props, "TaskBig", budget_3d=5e6, budget_2d=5e6)
    plans = planner.plan(num_modalities=1)
    stages = plans["3d"].plans_per_stage
    assert len(stages) == 2, "expected lowres + fullres cascade stages"
    assert np.prod(stages[0].current_spacing) > np.prod(stages[1].current_spacing)
    assert plans["3d"].fullres_stage_id == 1
