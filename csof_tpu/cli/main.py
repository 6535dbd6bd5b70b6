"""Command-line surface.

Capability parity with the reference's console scripts (ref: setup.py:29-53 —
nnUNet_convert_decathlon_task, nnUNet_plan_and_preprocess, nnUNet_train,
nnUNet_predict, nnUNet_ensemble, nnUNet_evaluate_folder, …) plus the fork's
analysis scripts (compute_jacobian/save_strain/throughput).

Commands:
  csof_convert_acdc        raw ACDC (or synthetic phantom) -> task layout
  csof_plan_and_preprocess crop + analyze + plan + preprocess
  csof_train               train any model kind from an experiment YAML
  csof_predict             sliding-window seg inference on a folder
  csof_evaluate            folder Dice/HD/ASSD summary.json
  csof_ensemble            average softmax npz across model outputs
  csof_strain / csof_jacobian  analysis over Flow/Registered/Segmentation trees
  csof_throughput          frames/sec/chip benchmark (bench.py protocol)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def convert_acdc_entry(argv=None):
    from csof_tpu.data.conversion.acdc import convert_acdc, make_synthetic_acdc

    p = argparse.ArgumentParser("csof_convert_acdc")
    p.add_argument("-i", "--input", help="ACDC root (patient*/ dirs)")
    p.add_argument("-o", "--output", required=True, help="task output dir")
    p.add_argument("--synthetic", type=int, default=0, help="generate N phantom patients instead")
    p.add_argument("--no-norm", action="store_true",
                   help="NoNorm task variant (ref Task031/035/039): modality 'noNorm'")
    p.add_argument("--export-unlabeled", action="store_true",
                   help="also export unannotated cine frames as <pid>_frame<NN>_u")
    a = p.parse_args(argv)
    if not a.input and not a.synthetic:
        p.error("provide -i/--input (ACDC root) or --synthetic N")
    src = a.input
    if a.synthetic:
        src = Path(a.output).parent / "synthetic_raw"
        make_synthetic_acdc(src, num_patients=a.synthetic)
    dj = convert_acdc(src, a.output, no_norm=a.no_norm, export_unlabeled=a.export_unlabeled)
    print(f"converted {dj['numTraining']} cases -> {a.output}")


def convert_mnms_entry(argv=None):
    """M&Ms conversion CLI (ref: Task114_heart_MNMs.py __main__)."""
    from csof_tpu.data.conversion.mnms import (
        convert_mnms,
        make_synthetic_mnms,
    )

    p = argparse.ArgumentParser("csof_convert_mnms")
    p.add_argument("-i", "--input", help="M&Ms root (walked for *_sa[_gt].nii.gz)")
    p.add_argument("--info", help="M&Ms Dataset Information (.csv or .xlsx)")
    p.add_argument("-o", "--output", required=True, help="task output dir")
    p.add_argument("--synthetic", type=int, default=0, help="generate N phantom patients instead")
    a = p.parse_args(argv)
    if a.synthetic:
        src = Path(a.output).parent / "synthetic_mnms_raw"
        info = make_synthetic_mnms(src, num_patients=a.synthetic)
    elif a.input and a.info:
        src, info = a.input, a.info
    else:
        p.error("provide -i/--input + --info, or --synthetic N")
    dj = convert_mnms(src, info, a.output)
    print(f"converted {dj['numTraining']} cases -> {a.output}")


def plan_and_preprocess_entry(argv=None):
    from csof_tpu.data.analysis import analyze_dataset
    from csof_tpu.data.cropping import run_cropping
    from csof_tpu.data.planning import ExperimentPlanner
    from csof_tpu.data.preprocessing import Preprocessor

    p = argparse.ArgumentParser("csof_plan_and_preprocess")
    p.add_argument("-t", "--task-dir", required=True)
    p.add_argument("-o", "--output", required=True, help="preprocessed output root")
    p.add_argument("--num-workers", type=int, default=4)
    a = p.parse_args(argv)
    task_dir, out = Path(a.task_dir), Path(a.output)
    dj = json.loads((task_dir / "dataset.json").read_text())
    num_mod = len(dj["modality"])
    cases = []
    for item in dj["training"]:
        case = Path(item["image"]).name.replace(".nii.gz", "")
        imgs = sorted((task_dir / "imagesTr").glob(f"{case}_*.nii.gz"))
        label = task_dir / "labelsTr" / f"{case}.nii.gz"
        cases.append((case, [str(i) for i in imgs], str(label) if label.exists() else None))
    cropped = out / "cropped"
    run_cropping(cases, cropped, num_workers=a.num_workers)
    props = analyze_dataset(cropped, num_modalities=num_mod, num_workers=a.num_workers)
    planner = ExperimentPlanner(props, task_dir.name)
    plans = planner.plan(num_mod, {int(k): v for k, v in dj["modality"].items()})
    for key, pl in plans.items():
        pdir = out / f"preprocessed_{key}"
        pdir.mkdir(parents=True, exist_ok=True)
        pl.to_json(out / f"plans_{key.upper()}.json")
        Preprocessor(pl).run(cropped, pdir, num_workers=a.num_workers)
    print(f"planned + preprocessed {len(cases)} cases -> {out}")


def train_entry(argv=None):
    from csof_tpu.config.experiment import ExperimentConfig, load_experiment_config
    from csof_tpu.config.plans import Plans
    from csof_tpu.data.dataset import do_split, load_dataset, unpack_dataset
    from csof_tpu.data.loaders import SegPatchLoader
    from csof_tpu.training.restore import save_trainer_sidecar
    from csof_tpu.training.trainer import Trainer

    p = argparse.ArgumentParser("csof_train")
    p.add_argument("-c", "--config", help="experiment YAML (defaults used if absent)")
    p.add_argument("-p", "--preprocessed", required=True, help="preprocessed root from plan_and_preprocess")
    p.add_argument("-t", "--task-dir", help="converted task dir (required for video/flow models)")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-f", "--fold", type=int, default=0)
    p.add_argument("--max-epochs", type=int)
    p.add_argument("--continue-training", action="store_true")
    p.add_argument("--validation-only", action="store_true",
                   help="skip training; run fold validation from the checkpoint")
    a = p.parse_args(argv)

    config = load_experiment_config(a.config) if a.config else ExperimentConfig(model="unet2d")
    if a.fold is not None:
        config.fold = a.fold
    if config.model in ("segflow", "voxelmorph", "raft"):
        if not a.task_dir:
            p.error(f"model '{config.model}' trains on cine videos: pass -t/--task-dir")
        return _train_video(a, config)
    pre_root = Path(a.preprocessed)
    key = "2d" if config.model == "unet2d" else "3d"
    plans = Plans.from_json(pre_root / f"plans_{key.upper()}.json")
    pre_dir = pre_root / f"preprocessed_{key}"
    unpack_dataset(pre_dir)
    ds = load_dataset(pre_dir)
    tr_keys, va_keys = do_split(list(ds), config.fold, splits_file=pre_root / "splits.pkl")
    sp = plans.fullres_stage()
    tr_loader = SegPatchLoader({k: ds[k] for k in tr_keys}, sp.patch_size, sp.batch_size,
                              num_modalities=plans.num_modalities, seed=config.seed)
    va_loader = SegPatchLoader({k: ds[k] for k in va_keys}, sp.patch_size, sp.batch_size,
                              num_modalities=plans.num_modalities, seed=config.seed + 1)
    out = Path(a.output) / f"fold_{config.fold}"
    trainer = Trainer(config, out, plans=plans, example_batch=next(tr_loader))
    save_trainer_sidecar(out, config, plans, plans.num_classes_with_background)
    if a.validation_only:
        from csof_tpu.training.validation import validate_fold

        trainer.load_checkpoint()
        summary = validate_fold(trainer, plans, pre_dir, config.fold, out / "validation_raw",
                                splits_file=pre_root / "splits.pkl")
        print(json.dumps(summary["mean"], indent=2))
        return
    if a.continue_training:
        trainer.load_checkpoint()
    trainer.run_training(iter(tr_loader), iter(va_loader), max_epochs=a.max_epochs)
    print(f"training done -> {out}")


def _train_video(a, config):
    """Flow/video-model training branch of csof_train (the reference's
    SegFlowGaussian/FinalFlow trainers, driven by the same CLI)."""
    from csof_tpu.data.loaders import VideoChunkLoader
    from csof_tpu.data.video_dataset import build_video_datasets, split_videos
    from csof_tpu.training.restore import save_trainer_sidecar
    from csof_tpu.training.trainer import Trainer

    videos = build_video_datasets(a.task_dir)
    if not videos:
        raise SystemExit(f"no cine videos found under {a.task_dir}/cine")
    tr_videos, va_videos = split_videos(videos, config.fold)

    def make_loader(vids, seed):
        return VideoChunkLoader(
            vids,
            video_length=config.data.video_length,
            batch_size=config.data.batch_size,
            crop_size=config.data.crop_size,
            seed=seed,
        )

    def to_model_batch(batch):
        if config.model == "segflow":
            return batch
        if config.model == "voxelmorph":
            v = batch["video"]
            return {"moving": v[:, -1], "fixed": v[:, 0]}
        if config.model == "raft":
            v = batch["video"]
            return {"image1": v[:, 0], "image2": v[:, -1]}
        raise ValueError(config.model)

    def wrap(loader):
        for batch in loader:
            yield to_model_batch(batch)

    out = Path(a.output) / f"fold_{config.fold}"
    tr_it = wrap(make_loader(tr_videos, config.seed))
    va_it = wrap(make_loader(va_videos or tr_videos, config.seed + 1))
    first = next(tr_it)
    trainer = Trainer(config, out, num_classes=4, example_batch=first)
    save_trainer_sidecar(out, config, None, 4)
    if a.continue_training:
        trainer.load_checkpoint()

    def chain(first_batch, it):
        yield first_batch
        yield from it

    trainer.run_training(chain(first, tr_it), va_it, max_epochs=a.max_epochs)
    print(f"training done -> {out}")


def predict_entry(argv=None):
    import jax

    from csof_tpu.config.plans import Plans
    from csof_tpu.data.preprocessing import Preprocessor
    from csof_tpu.inference.export import save_segmentation_from_softmax
    from csof_tpu.inference.predictor import PredictorConfig, SlidingWindowPredictor
    from csof_tpu.training.restore import restore_trainer

    p = argparse.ArgumentParser("csof_predict")
    p.add_argument("-m", "--model-dir", required=True, help="fold_N training output dir")
    p.add_argument("-i", "--input", required=True, help="folder of *_0000.nii.gz")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--step-size", type=float, default=0.5)
    p.add_argument("--disable-tta", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--save-npz", action="store_true",
                   help="also dump softmax npz for csof_ensemble (ref --save_npz)")
    p.add_argument("--num-parts", type=int, default=1,
                   help="shard the case list across N workers (ref predict_simple.py --num_parts)")
    p.add_argument("--part-id", type=int, default=0)
    a = p.parse_args(argv)

    model_dir = Path(a.model_dir)
    plans = Plans.from_json(model_dir / "plans.json")
    sp = plans.fullres_stage()
    pre = Preprocessor(plans, stage=plans.fullres_stage_id)

    in_dir, out_dir = Path(a.input), Path(a.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    case_files: dict[str, list[Path]] = {}
    for f in sorted(in_dir.glob("*_*.nii.gz")):
        case = f.name.rsplit("_", 1)[0]
        case_files.setdefault(case, []).append(f)
    # embarrassingly-parallel case sharding across workers/hosts
    names = sorted(case_files)[a.part_id :: a.num_parts]
    case_files = {k: case_files[k] for k in names}
    if not case_files:
        p.error(f"no cases for part {a.part_id}/{a.num_parts} in {in_dir}")

    # restore net params
    first_files = next(iter(case_files.values()))
    data, seg, props = pre.run_case_from_files([str(x) for x in first_files], None)
    example = _example_seg_batch(data, sp)
    trainer = restore_trainer(model_dir, example, checkpoint_name=a.checkpoint)
    net = trainer.model
    params = trainer.state.params

    def apply_fn(p_, x):
        out = net.apply(p_, x)
        return out[0] if isinstance(out, tuple) else out

    cfg = PredictorConfig(
        patch_size=tuple(sp.patch_size),
        num_classes=plans.num_classes_with_background,
        step_size=a.step_size,
        do_mirroring=not a.disable_tta,
    )
    predictor = SlidingWindowPredictor(apply_fn, cfg)

    for case, files in case_files.items():
        data, _, props = pre.run_case_from_files([str(x) for x in files], None)
        if len(sp.patch_size) == 2:
            _, softmax = predictor.predict_2d_stack(params, data)
        else:
            _, softmax = predictor.predict(params, data)
        save_segmentation_from_softmax(softmax, out_dir / f"{case}.nii.gz", props,
                                       save_npz=a.save_npz)
        print(f"predicted {case}")


def _example_seg_batch(data, sp):
    patch = tuple(sp.patch_size)
    c = data.shape[0]
    x = np.zeros((1, *patch, c), np.float32)
    y = np.zeros((1, *patch), np.int32)
    return {"data": x, "seg": y}


def predict_flow_entry(argv=None):
    """Full-cine seg+flow inference writing Flow/Registered/Segmentation
    trees (the reference's validate_flow output path,
    ref: SegFlowGaussian.py(trainer):896-1208)."""
    import numpy as _np

    from csof_tpu.data.video_dataset import build_video_datasets
    from csof_tpu.inference.flow_predictor import FlowPredictor, predict_and_export_case
    from csof_tpu.training.restore import restore_trainer

    p = argparse.ArgumentParser("csof_predict_flow")
    p.add_argument("-m", "--model-dir", required=True, help="fold_N segflow training dir")
    p.add_argument("-t", "--task-dir", required=True, help="converted task dir with cine/")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--disable-tta", action="store_true")
    a = p.parse_args(argv)

    videos = build_video_datasets(a.task_dir)
    if not videos:
        p.error(f"no cine videos under {a.task_dir}/cine")
    first = next(iter(videos.values()))
    t = first["frames"].shape[0]
    from csof_tpu.config.experiment import load_experiment_config

    config = load_experiment_config(Path(a.model_dir) / "config.yaml")
    cs = a.crop_size or config.data.crop_size
    example = {
        "video": _np.zeros((1, config.data.video_length, cs, cs, 1), _np.float32),
        "seg": _np.zeros((1, config.data.video_length, cs, cs), _np.int32),
        "labeled_mask": _np.zeros((1, config.data.video_length), _np.float32),
    }
    trainer = restore_trainer(a.model_dir, example)
    net, params = trainer.model, trainer.state.params
    # Inference-time serving config — the SAME one bench.py measures
    # (csof_tpu/inference/serving.py is the single source of truth): full
    # temporal unroll (~15% over the rolled scan, docs/BENCHMARKS.md round
    # 3) + the channel-major concat fuse (+3.9%, round 4). Both remaps are
    # param-compatible, so the restored checkpoint applies unchanged.
    # CSOF_INFER_UNROLL=0 / CSOF_SERVE_FUSE=0 opt out.
    if getattr(net, "cfg", None) is not None:
        from csof_tpu.inference.serving import apply_serving_config
        from csof_tpu.models.segflow import SegFlow as _SegFlow

        if isinstance(net, _SegFlow):
            net = _SegFlow(
                cfg=apply_serving_config(net.cfg),
                num_classes=net.num_classes,
            )
    predictor = FlowPredictor(
        lambda v: net.apply(params, v), crop_size=cs, do_mirroring=not a.disable_tta
    )
    from csof_tpu.data.video_dataset import put_ed_first

    for pid, v in videos.items():
        # anchor the cumulative flow at the ED frame (ref: predict.py:1165)
        frames, _, _ = put_ed_first(v["frames"], v["ed"])
        predict_and_export_case(predictor, frames, {}, a.output, pid)
        print(f"predicted {pid}")


def evaluate_entry(argv=None):
    from csof_tpu.evaluation.evaluator import aggregate_scores

    p = argparse.ArgumentParser("csof_evaluate")
    p.add_argument("-p", "--pred", required=True)
    p.add_argument("-r", "--ref", required=True)
    p.add_argument("-l", "--labels", type=int, nargs="+", required=True)
    p.add_argument("-o", "--output", default=None)
    p.add_argument(
        "--nsd-threshold", type=float, nargs="*", default=[],
        help="also report normalized surface dice at these tolerances in mm "
        "(ref: evaluation/surface_dice.py:20)",
    )
    a = p.parse_args(argv)
    pred_dir, ref_dir = Path(a.pred), Path(a.ref)
    pairs = []
    for f in sorted(pred_dir.glob("*.nii.gz")):
        r = ref_dir / f.name
        if r.exists():
            pairs.append((str(f), str(r)))
    if not pairs:
        p.error(f"no matching prediction/reference pairs between {pred_dir} and {ref_dir}")
    out = a.output or (pred_dir / "summary.json")
    res = aggregate_scores(
        pairs, a.labels, json_output_file=out, nsd_thresholds=tuple(a.nsd_threshold)
    )
    print(json.dumps(res["mean"], indent=2))


def ensemble_entry(argv=None):
    p = argparse.ArgumentParser("csof_ensemble")
    p.add_argument("-f", "--folders", nargs="+", required=True, help="folders with <case>.npz softmax dumps")
    p.add_argument("-o", "--output", required=True)
    a = p.parse_args(argv)
    out = Path(a.output)
    out.mkdir(parents=True, exist_ok=True)
    folders = [Path(f) for f in a.folders]
    cases = sorted({f.stem for f in folders[0].glob("*.npz")})
    for case in cases:
        acc = None
        for folder in folders:
            sm = np.load(folder / f"{case}.npz")["softmax"]
            acc = sm if acc is None else acc + sm
        acc = acc / len(folders)
        np.savez_compressed(out / f"{case}.npz", softmax=acc)
        np.save(out / f"{case}_seg.npy", acc.argmax(0).astype(np.uint8))
    print(f"ensembled {len(cases)} cases from {len(folders)} models")


def find_best_configuration_entry(argv=None):
    """Pick the best config/ensemble from validation softmax dumps
    (ref: nnUNet_find_best_configuration, evaluation/model_selection/
    figure_out_what_to_submit.py)."""
    from csof_tpu.evaluation.model_selection import find_best_configuration
    from csof_tpu.utils.nifti import load_nifti

    p = argparse.ArgumentParser("csof_find_best_configuration")
    p.add_argument("-f", "--folders", nargs="+", required=True,
                   help="named softmax folders as name=path (npz dumps per case)")
    p.add_argument("-r", "--ref", required=True, help="GT label folder")
    p.add_argument("-l", "--labels", type=int, nargs="+", required=True)
    p.add_argument("-o", "--output", default="best_configuration.json")
    a = p.parse_args(argv)
    configs = {}
    cases = None
    for spec in a.folders:
        name, _, path = spec.partition("=")
        if not path:
            p.error(f"folder spec must be name=path, got {spec!r}")
        folder = Path(path)
        ids = sorted(f.stem for f in folder.glob("*.npz"))
        if cases is None:
            cases = ids
        elif ids != cases:
            p.error(f"case mismatch between folders: {name}")
        configs[name] = [np.load(folder / f"{c}.npz")["softmax"] for c in ids]
    gts = []
    for c in cases:
        gt_file = Path(a.ref) / f"{c}.nii.gz"
        if not gt_file.exists():
            p.error(f"missing GT {gt_file}")
        gts.append(load_nifti(gt_file).data_czyx)
    res = find_best_configuration(configs, gts, a.labels, output_file=a.output)
    print(json.dumps({"best": res["best"], "scores": res["scores"]}, indent=2))


def strain_entry(argv=None):
    from csof_tpu.analysis.flow_analysis import (
        analyze_prediction_tree,
        export_strain_curves,
        write_strain_csv,
    )

    p = argparse.ArgumentParser("csof_strain")
    p.add_argument("-i", "--input", required=True, help="prediction tree root (Flow/ Registered/ Segmentation/)")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--gt-seg", default=None,
                   help="folder of per-case GT 4D label NIfTIs for contour tracking error")
    a = p.parse_args(argv)
    out = a.output or (Path(a.input) / "analysis.json")
    report = analyze_prediction_tree(a.input, out, gt_seg_dir=a.gt_seg)
    write_strain_csv(report, Path(out).with_suffix(".csv"))
    # per-case Medis-convention curve files for csof_strain_curve_metric
    # (ref: save_strain.py per-patient curve export)
    n = export_strain_curves(report, Path(a.input) / "strain_curves")
    print(f"analysis -> {out} ({n} strain-curve files)")


def jacobian_entry(argv=None):
    strain_entry(argv)  # same tree analysis covers jacobian + strain


def strain_curve_metric_entry(argv=None):
    """Compare AI vs GT strain curves (ref: compute_strain_curve_metric.py
    mean-curve comparison + compute_stats_strain.py per-case CSV). AI and GT
    folders hold per-case curve files (.mat Medis export / .npz / .npy)
    matched by sorted order, or by basename with --match-names."""
    from csof_tpu.analysis.strain_curves import aggregate_strain_curve_metrics

    p = argparse.ArgumentParser("csof_strain_curve_metric")
    p.add_argument("--ai", required=True, help="folder of AI strain curve files")
    p.add_argument("--gt", required=True, help="folder of GT strain curve files")
    p.add_argument("-o", "--output", default=None, help="output folder (default: AI folder)")
    p.add_argument("--match-names", action="store_true",
                   help="pair by identical basename instead of sorted order")
    a = p.parse_args(argv)
    exts = ("*.mat", "*.npz", "*.npy")
    ai_files = sorted(f for pat in exts for f in Path(a.ai).glob(pat))
    gt_files = sorted(f for pat in exts for f in Path(a.gt).glob(pat))
    if a.match_names:
        gt_by_name = {f.name: f for f in gt_files}
        pairs = [(f, gt_by_name[f.name]) for f in ai_files if f.name in gt_by_name]
    else:
        # the reference pairs sorted glob lists positionally
        # (compute_strain_curve_metric.py:16-17, zip at :26)
        pairs = list(zip(ai_files, gt_files))
    if not pairs:
        p.error(f"no curve file pairs between {a.ai} and {a.gt}")
    out_dir = Path(a.output) if a.output else Path(a.ai)
    out_dir.mkdir(parents=True, exist_ok=True)
    res = aggregate_strain_curve_metrics(
        pairs,
        csv_out=out_dir / "strain_metrics.csv",
        json_out=out_dir / "strain_curve_summary.json",
    )
    print(json.dumps(res["mean"], indent=2))
    print(f"{len(pairs)} cases -> {out_dir}/strain_metrics.csv")


def throughput_entry(argv=None):
    import bench

    bench.main()


def determine_postprocessing_entry(argv=None):
    """Decide keep-largest-CC postprocessing from validation predictions and
    persist it beside the model (ref: nnUNet_determine_postprocessing,
    nnunet/postprocessing/consolidate_postprocessing_simple.py:22)."""
    from csof_tpu.evaluation.postprocessing import determine_postprocessing
    from csof_tpu.utils.nifti import load_nifti

    p = argparse.ArgumentParser("csof_determine_postprocessing")
    p.add_argument("-p", "--pred", required=True, help="validation predictions (*.nii.gz)")
    p.add_argument("-r", "--ref", required=True, help="GT label folder")
    p.add_argument("-l", "--labels", type=int, nargs="+", required=True)
    p.add_argument("-o", "--output", default=None,
                   help="postprocessing.json path (default: <pred>/postprocessing.json)")
    a = p.parse_args(argv)
    pred_dir = Path(a.pred)
    pairs = []
    for f in sorted(pred_dir.glob("*.nii.gz")):
        r = Path(a.ref) / f.name
        if r.exists():
            pairs.append((load_nifti(f).data_czyx, load_nifti(r).data_czyx))
    if not pairs:
        p.error(f"no matching pairs between {a.pred} and {a.ref}")
    out = a.output or (pred_dir / "postprocessing.json")
    res = determine_postprocessing(pairs, a.labels, output_file=out)
    print(json.dumps(res, indent=2))


def export_model_entry(argv=None):
    """Package a trained model output folder (checkpoint triad, config/plans
    sidecars, postprocessing decision) into a portable zip
    (ref: nnUNet_export_model_to_zip, inference/pretrained_models/
    collect_pretrained_models.py:export_entry_point)."""
    import zipfile

    p = argparse.ArgumentParser("csof_export_model_to_zip")
    p.add_argument("-m", "--model", required=True, help="trained folder (e.g. results/fold_0)")
    p.add_argument("-o", "--output", required=True, help="output .zip")
    a = p.parse_args(argv)
    model = Path(a.model)
    if not model.is_dir():
        p.error(f"{model} is not a directory")
    keep = {".msgpack", ".json", ".yaml", ".pkl"}
    with zipfile.ZipFile(a.output, "w", zipfile.ZIP_DEFLATED) as z:
        n = 0
        for f in sorted(model.rglob("*")):
            if f.is_file() and f.suffix in keep:
                z.write(f, f.relative_to(model))
                n += 1
    if not n:
        p.error(f"nothing exportable in {model}")
    print(f"exported {n} files -> {a.output}")


def install_model_entry(argv=None):
    """Unpack a model zip into a results folder
    (ref: nnUNet_install_pretrained_model_from_zip,
    download_pretrained_model.py:install_from_zip_entry_point; network
    downloads are not supported in this zero-egress build — install from a
    local zip instead)."""
    import zipfile

    p = argparse.ArgumentParser("csof_install_model_from_zip")
    p.add_argument("zip", help="model zip produced by csof_export_model_to_zip")
    p.add_argument("-o", "--output", required=True, help="target model folder")
    a = p.parse_args(argv)
    out = Path(a.output)
    out.mkdir(parents=True, exist_ok=True)
    root = out.resolve()
    with zipfile.ZipFile(a.zip) as z:
        for name in z.namelist():
            dest = (out / name).resolve()
            # is_relative_to (not a string prefix check): /x/model2 is NOT
            # inside /x/model even though the string starts with it
            if not (dest == root or dest.is_relative_to(root)):
                p.error(f"refusing unsafe zip member path {name!r}")
        z.extractall(out)
        n = len(z.namelist())
    print(f"installed {n} files -> {out}")


def print_models_entry(argv=None):
    """List locally installed/trained models under a results root
    (ref: nnUNet_print_available_pretrained_models — the reference prints a
    download registry; this build is zero-egress, so the registry is the
    local results tree)."""
    from csof_tpu.config.paths import default_paths

    p = argparse.ArgumentParser("csof_print_available_models")
    p.add_argument("-r", "--root", default=None, help="results root (default: CSOF results dir)")
    a = p.parse_args(argv)
    root = Path(a.root) if a.root else default_paths().results
    found = sorted({f.parent for f in Path(root).rglob("model_*.msgpack")})
    if not found:
        print(f"no trained models under {root}")
    for folder in found:
        cfg = folder / "config.yaml"
        kind = ""
        if cfg.exists():
            for line in cfg.read_text().splitlines():
                if line.startswith("model:"):
                    kind = line.split(":", 1)[1].strip()
        print(f"{folder}  model={kind}")


def change_model_entry(argv=None):
    """Rewrite the `model:` kind in a trained folder's config.yaml sidecar
    (ref: nnUNet_change_trainer_class, inference/change_trainer.py — the
    reference edits the trainer-class name pickled into model.pkl; here the
    model kind lives in the YAML sidecar)."""
    import yaml

    p = argparse.ArgumentParser("csof_change_model")
    p.add_argument("-m", "--model", required=True, help="trained folder with config.yaml")
    p.add_argument("-k", "--kind", required=True,
                   help="new model kind (unet2d/unet3d/segflow/raft/voxelmorph/...)")
    a = p.parse_args(argv)
    cfg_path = Path(a.model) / "config.yaml"
    if not cfg_path.exists():
        p.error(f"{cfg_path} not found")
    cfg = yaml.safe_load(cfg_path.read_text())
    old = cfg.get("model")
    cfg["model"] = a.kind
    cfg_path.write_text(yaml.safe_dump(cfg))
    print(f"{cfg_path}: model {old} -> {a.kind}")


def plot_task_pngs_entry(argv=None):
    """Overlay PNGs (image + label) for every case of a raw task folder
    (ref: nnUNet_plot_task_pngs, nnunet/utilities/overlay_plots.py:
    entry_point_generate_overlay)."""
    from csof_tpu.utils.nifti import load_nifti
    from csof_tpu.utils.visualization import seg_overlay

    p = argparse.ArgumentParser("csof_plot_task_pngs")
    p.add_argument("-t", "--task", required=True, help="raw task folder (imagesTr/ labelsTr/)")
    p.add_argument("-o", "--output", default=None, help="default: <task>/overlays")
    a = p.parse_args(argv)
    task = Path(a.task)
    out = Path(a.output) if a.output else task / "overlays"
    out.mkdir(parents=True, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 0
    for lab in sorted((task / "labelsTr").glob("*.nii.gz")):
        case = lab.name.replace(".nii.gz", "")
        img_f = task / "imagesTr" / f"{case}_0000.nii.gz"
        if not img_f.exists():
            continue
        img = load_nifti(img_f).data_czyx
        seg = load_nifti(lab).data_czyx
        z = int(np.argmax((seg > 0).sum(axis=(1, 2))))  # most-foreground slice
        sl = img[z].astype(np.float32)
        lo, hi = np.percentile(sl, (1, 99))
        sl = np.clip((sl - lo) / max(hi - lo, 1e-6), 0, 1)
        plt.imsave(out / f"{case}.png", seg_overlay(sl, seg[z]))
        n += 1
    print(f"wrote {n} overlays -> {out}")


def convert_decathlon_entry(argv=None):
    """Convert a Medical-Segmentation-Decathlon task (4D multi-modality
    images) to the raw layout (one 3D file per modality, `_0000` suffixes)
    (ref: nnUNet_convert_decathlon_task, experiment_planning/
    nnUNet_convert_decathlon_task.py + utils.py:split_4d)."""
    from csof_tpu.utils.nifti import load_nifti, save_nifti

    p = argparse.ArgumentParser("csof_convert_decathlon_task")
    p.add_argument("-i", "--input", required=True, help="decathlon task folder")
    p.add_argument("-o", "--output", required=True)
    a = p.parse_args(argv)
    src, out = Path(a.input), Path(a.output)
    images_tr = out / "imagesTr"
    labels_tr = out / "labelsTr"
    images_tr.mkdir(parents=True, exist_ok=True)
    labels_tr.mkdir(parents=True, exist_ok=True)
    cases = []
    for f in sorted((src / "imagesTr").glob("*.nii.gz")):
        if f.name.startswith("."):
            continue  # decathlon tars ship ._ AppleDouble files
        case = f.name.replace(".nii.gz", "")
        img = load_nifti(f)
        vol = img.data_czyx  # (z,y,x), or (t,z,y,x) with t = modalities
        mods = vol[None] if vol.ndim == 3 else vol
        for m in range(mods.shape[0]):
            save_nifti(mods[m], images_tr / f"{case}_{m:04d}.nii.gz", affine=img.affine)
        lab = src / "labelsTr" / f.name
        if lab.exists():
            li = load_nifti(lab)
            save_nifti(li.data_czyx, labels_tr / f.name, affine=li.affine, dtype=np.uint8)
        cases.append(case)
    dataset = json.loads((src / "dataset.json").read_text()) if (src / "dataset.json").exists() else {}
    dataset["training"] = [
        {"image": f"./imagesTr/{c}.nii.gz", "label": f"./labelsTr/{c}.nii.gz"} for c in cases
    ]
    (out / "dataset.json").write_text(json.dumps(dataset, indent=2))
    print(f"converted {len(cases)} cases -> {out}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "--help"
    dispatch = {
        "convert_acdc": convert_acdc_entry,
        "plan_and_preprocess": plan_and_preprocess_entry,
        "train": train_entry,
        "predict": predict_entry,
        "predict_flow": predict_flow_entry,
        "evaluate": evaluate_entry,
        "ensemble": ensemble_entry,
        "find_best_configuration": find_best_configuration_entry,
        "strain": strain_entry,
        "jacobian": jacobian_entry,
        "strain_curve_metric": strain_curve_metric_entry,
        "throughput": throughput_entry,
        "convert_mnms": convert_mnms_entry,
        "convert_decathlon": convert_decathlon_entry,
        "determine_postprocessing": determine_postprocessing_entry,
        "export_model_to_zip": export_model_entry,
        "install_model_from_zip": install_model_entry,
        "print_available_models": print_models_entry,
        "change_model": change_model_entry,
        "plot_task_pngs": plot_task_pngs_entry,
    }
    if cmd in dispatch:
        dispatch[cmd](sys.argv[2:])
    else:
        print("commands:", ", ".join(dispatch))
