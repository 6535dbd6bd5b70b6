"""Per-experiment configuration (the reference's YAML layer, typed).

The reference drives its flow/video models from a ~170-key YAML
(ref: nnunet/video.yaml, parsed by nnunet/lib/training_utils.py:459-485 and
consumed by `build_seg_flow_gaussian_model` at training_utils.py:1460-1535).
Its combinatorics (25 forward variants x 45 dataloaders) collapse here into
one typed config with a `model` discriminator covering the five BASELINE
configs: unet2d, unet3d, raft, voxelmorph, segflow.

Unknown YAML keys are rejected loudly (the reference silently ignored typos).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Literal

import yaml

ModelKind = Literal["unet2d", "unet3d", "raft", "voxelmorph", "segflow"]


@dataclass
class OptimConfig:
    """Optimizer/schedule (ref: video.yaml optimizer/scheduler/initial_lr/...;
    nnUNetTrainerV2 SGD+poly at ref: nnUNetTrainerV2.py:171,407)."""

    optimizer: Literal["adamw", "sgd"] = "adamw"
    scheduler: Literal["cosine", "poly", "constant"] = "cosine"
    initial_lr: float = 1e-4
    weight_decay: float = 1e-4
    warmup_percent: float = 0.1
    sgd_momentum: float = 0.99
    nesterov: bool = True
    poly_exponent: float = 0.9
    eta_min: float = 1e-7
    grad_clip_norm: float = 12.0  # ref: nnUNetTrainerV2.py:273, SegFlowGaussian.py:2226
    # the V2 recipe's rescue for datasets where momentum 0.99 diverges: if
    # the online foreground dice is still 0 at this epoch, drop SGD momentum
    # to `momentum_rescue_value` and reinitialize the network weights
    # (ref: nnUNetTrainerV2.py:424-434 on_epoch_end). 0 disables.
    momentum_rescue_epoch: int = 100
    momentum_rescue_value: float = 0.95


@dataclass
class LossWeights:
    """Flow-model loss weights (ref: video.yaml *_loss_weight keys; used by
    compute_losses_backward at ref: SegFlowGaussian.py(trainer):1370-1460)."""

    image_flow_global: float = 0.5      # NCC(warped, fixed)
    regularization_xy: float = 1.0      # spatial flow-gradient^2
    regularization_z: float = 0.0       # temporal flow-gradient^2
    seg_registered: float = 0.0         # Dice(warp(seg_ED), seg_ES)
    segmentation: float = 0.0           # supervised seg loss on labeled frames
    cycle_flow: float = 0.0             # forward/backward flow cycle consistency
    cycle_registered: float = 0.0
    global_motion_forward: float = 0.01
    raft_sequence_gamma: float = 0.8    # ref: nnMTLTrainerV2Raft.py:182


@dataclass(frozen=True)
class SegFlowModelConfig:
    """Joint seg+flow video model hyperparameters
    (ref: video.yaml model keys; SegFlowGaussian model __init__ at
    ref: nnunet/network_architecture/SegFlowGaussian.py:70-378)."""

    in_encoder_dims: tuple[int, ...] = (6, 64, 128)
    out_encoder_dims: tuple[int, ...] = (32, 64, 128)
    d_model: int = 128
    bottleneck_heads: int = 4
    nb_layers: int = 1
    dim_feedforward: int = 1024
    norm: Literal["group", "batch", "instance"] = "group"
    activation: str = "gelu"
    conv_depth: tuple[int, ...] = (1, 1, 1)
    # local correlation volume per skip level (ref: SegFlowGaussian.py:255-269)
    corr_radius: tuple[int, ...] = (4, 4, 4)
    corr_stride: tuple[int, ...] = (2, 1, 1)
    use_cost_volume: bool = True
    # how the (2r+1)^2-channel correlation joins the skip-fuse conv:
    #   concat  — 3x3 conv over the raw (q ⊕ m ⊕ corr) concat (the
    #             reference's shape; ref: SegFlowGaussian.py:1374-1386)
    #   split   — EXACT same math as concat (conv is linear in channels),
    #             computed as conv(q)+conv(m)+conv(corr) without
    #             materializing the lane-padded 145/209/337-channel concat
    #   project — corr is 1x1-projected to the skip width first, then
    #             fused; factorizes the corr part of the conv (low-rank),
    #             trading a little capacity for a much smaller fuse conv
    #   concat_cm — EXACT same math as concat, but the concat happens in
    #             CHANNEL-MAJOR: the hoisted q_cm skips, one per-level m
    #             transpose (shared with the corr kernel via m_cm=True) and
    #             the kernel's native channel-major corr feed an NCHW fuse
    #             conv — no corr output transpose, no in-kernel m
    #             transpose, and the (C_q+C_m+81)-channel buffer is not
    #             lane-padded (145 leading vs 256 padded lanes). Params
    #             are path/shape-identical to concat.
    #   fused_cm — the whole corr+concat+conv+norm+act chain as ONE Pallas
    #             megakernel per level (ops/pallas/skipfuse.py). Same math
    #             and param tree as concat/concat_cm (up to bf16
    #             accumulation order); forward-only -> a SERVING remap,
    #             never a training config.
    corr_fuse: Literal[
        "concat", "split", "project", "mean1", "concat_cm", "fused_cm"
    ] = "concat"
    # split-mode only: precompute the query-side fuse conv conv_q(q) ONCE,
    # T-batched, outside the temporal recurrence (it depends only on the
    # hoisted query skips, never on the carry) instead of as `levels` serial
    # batch-1 convs per scan step. Exact same math; the conv_q params move
    # from the scan-step scope to the SegFlow top level (`fuse_q_{lvl}`) —
    # `models.segflow.hoist_fuse_q_params` maps existing checkpoints.
    fuse_q_hoist: bool = False
    # run the two cross-attention bottlenecks (current-vs-previous and
    # current-vs-ED+motion, ref: SegFlowGaussian.py:1395-1407) as ONE
    # pair-batched call instead of two serial ones. Exact same math (the
    # layers share no params; their weights are stacked on a leading pair
    # axis), but every projection/norm/FFN runs once at batch 2 instead of
    # twice at batch 1 — halves the kernel count on the latency-bound
    # 32x32-token bottleneck path. Params live under `bottleneck_dual`
    # (stacked); `models.segflow.fuse_bottleneck_params` maps checkpoints
    # between the layouts.
    attn_fused: bool = False
    use_gru: bool = True
    # decoder upsample: "expand" = the reference's PatchExpand
    # (ConvTranspose(2,2)+GN+GELU, ref: nnunet/lib/utils.py:1982) in the
    # fast matmul+depth-to-space form; "linear" = bilinear resize, which
    # keeps the round-2 upsample MATH available (note: round-2 checkpoint
    # FILES do not load either way — the round-3 scope move of
    # query_encoder/seg_decoder out of the scan step changed the param
    # tree for all settings)
    dec_upsample: Literal["expand", "linear"] = "expand"
    # per-scale auxiliary decoder heads, weighted 1/2^i in the loss
    # (ref: video.yaml `deep_supervision`; decoder DS heads at
    # ref: nnunet/lib/decoder_alt.py:852-856)
    deep_supervision: bool = False
    kernel_size: int = 3
    pos_1d: Literal["sin", "learn"] = "sin"
    backward_flow: bool = True
    # jax.checkpoint the per-frame step: recompute activations in backward
    # instead of storing T copies (HBM/FLOPs trade; SURVEY TPU notes)
    remat: bool = False
    # lax.scan unroll factor for the temporal loop. Convs inside a scan body
    # are layout-constrained by the loop boundary and measured 3-5x slower
    # than the identical convs outside it (docs/BENCHMARKS.md round 3);
    # unrolling restores the compiler's freedom at the cost of compile time.
    # scan_unroll == T fully unrolls the lax.scan body (one while-loop trip
    # carrying the whole straight-line step program — measured FASTER than
    # both the rolled scan and the no-scan Python loop: 1484 vs 1271/1361
    # f/s at B=8, tools/bench_explore.py scanperf/unrollloop).
    # scan_unroll > T switches to a plain Python loop over frames (no
    # lax.scan at all); params are identical across all three paths (one
    # shared SegFlowStep, name-pinned). scan_unroll == -1 means "fully
    # unroll for whatever T arrives" (the serving sweet spot when T varies
    # per case, e.g. FlowPredictor inference).
    scan_unroll: int = 1
    # run the WHOLE temporal loop (frame-0 prime specialization + full
    # steps 1..T-1, Python-unrolled) inside ONE length-1 nn.scan trip: the
    # while-op program form measured consistently faster than equivalent
    # straight-line code on this backend (1572 vs 1514/1482 f/s), while the
    # frame-0 prime eliminates the dead flow-decoder + level-0/1 corr+fuse
    # work (loop path: 1361 -> 1482). This combines both. Exact same math
    # and param tree as the other temporal paths (the step module is
    # name-pinned; function-form scan keeps children at the SegFlow top
    # level). Ignored under remat (prime is, see segflow.py).
    scan_while1: bool = False
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class RaftModelConfig:
    """RAFT (ref: torchvision raft_large pinned at
    ref: nnunet/training/network_training/nnMTLTrainerV2Raft.py:97,104;
    video.yaml raft_iters/radius)."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    feature_dim: int = 256
    dtype: str = "bfloat16"
    #: lax.scan unroll factor for the GRU refinement loop. At 1/8-res
    #: serving geometry (28² for 224² inputs) every op in the update block
    #: is far below the measured 75-90 us/kernel dispatch floor of this
    #: backend, so the 12-iteration loop is kernel-count bound exactly like
    #: the SegFlow temporal scan (docs/BENCHMARKS.md round 4); unrolling
    #: lets XLA fuse across iterations. iters % unroll must be 0; params
    #: are identical for any value (nn.scan is a lifted transform).
    scan_unroll: int = 1


@dataclass(frozen=True)
class VoxelMorphModelConfig:
    """Registration net (ref: nnunet/network_architecture/Optical_flow_model.py:72,
    integration at ref: nnunet/network_architecture/integration.py:84-98)."""

    enc_features: tuple[int, ...] = (16, 32, 32, 32)
    dec_features: tuple[int, ...] = (32, 32, 32, 32, 32, 16, 16)
    int_steps: int = 7
    diffeomorphic: bool = True
    dtype: str = "bfloat16"


@dataclass
class DataConfig:
    """Video sampling / augmentation (ref: video.yaml video_length/crop/...,
    sampling at ref: nnunet/training/dataloading/dataset_loading.py:6428-6452)."""

    video_length: int = 6
    batch_size: int = 1
    image_size: int = 224
    crop_size: int = 128
    do_data_aug: bool = True
    oversample_foreground_percent: float = 0.33  # ref: nnUNetTrainer default
    num_workers: int = 4


@dataclass
class ExperimentConfig:
    model: ModelKind = "segflow"
    task: str = "Task027_ACDC"
    fold: int = 0
    max_num_epochs: int = 180           # ref: video.yaml max_num_epochs
    num_batches_per_epoch: int = 250    # ref: network_trainer.py:109
    num_val_batches_per_epoch: int = 50  # ref: network_trainer.py:110
    deep_supervision: bool = True
    seed: int = 12345
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss_weights: LossWeights = field(default_factory=LossWeights)
    segflow: SegFlowModelConfig = field(default_factory=SegFlowModelConfig)
    raft: RaftModelConfig = field(default_factory=RaftModelConfig)
    voxelmorph: VoxelMorphModelConfig = field(default_factory=VoxelMorphModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    # parallelism: devices per mesh axis; -1 on `data` means "all remaining"
    mesh_data: int = -1
    mesh_model: int = 1

    def to_yaml(self, path: str | Path) -> None:
        Path(path).write_text(yaml.safe_dump(dataclasses.asdict(self), sort_keys=False))

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExperimentConfig":
        return _from_dict(cls, d)


def _from_dict(cls, d: dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return d
    names = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(d) - set(names)
    if unknown:
        raise KeyError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for k, v in d.items():
        f = names[k]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _NESTED
        ):
            sub = _NESTED[f.type] if isinstance(f.type, str) else f.type
            kwargs[k] = _from_dict(sub, v) if isinstance(v, dict) else v
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


_NESTED = {
    "OptimConfig": OptimConfig,
    "LossWeights": LossWeights,
    "SegFlowModelConfig": SegFlowModelConfig,
    "RaftModelConfig": RaftModelConfig,
    "VoxelMorphModelConfig": VoxelMorphModelConfig,
    "DataConfig": DataConfig,
}


def load_experiment_config(path: str | Path) -> ExperimentConfig:
    """Load a YAML experiment config; like the reference, the config file is
    copied next to the weights and re-read for validation-only runs
    (ref: nnunet/run/run_training.py:190-194)."""
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    return ExperimentConfig.from_dict(d)
