"""Loss library (jittable, batched).

Capability parity with the reference's loss stack
(ref: nnunet/training/loss_functions/dice_loss.py:26-604 — SoftDice, GDL,
DC_and_CE, DC_and_topk, DC_and_focal; crossentropy.py:5; TopK_loss.py:20;
focal_loss.py:22; deep_supervision.py:24 MultipleOutputLoss2) and the
registration losses (ref: nnunet/lib/loss.py:15-178 — windowed NCC,
spatial/temporal smoothing) plus the RAFT sequence loss
(ref: nnunet/training/network_training/nnMTLTrainerV2Raft.py:182,1522).

Conventions: logits are channels-last (N, *spatial, C); targets are integer
label maps (N, *spatial) unless stated. All reductions return scalars.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


def get_tp_fp_fn_tn(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    axes: Sequence[int] | None = None,
    mask: jnp.ndarray | None = None,
    square: bool = False,
):
    """Soft confusion-matrix pieces per class
    (ref: dice_loss.py:101-160 `get_tp_fp_fn_tn`).

    probs: (N, *spatial, C) softmax probabilities; target: (N, *spatial) int
    or (N, *spatial, C) one-hot. Reduces over `axes` (default: spatial).
    """
    c = probs.shape[-1]
    if target.ndim == probs.ndim - 1:
        y = one_hot(target, c)
    else:
        y = target.astype(probs.dtype)
    if axes is None:
        axes = tuple(range(1, probs.ndim - 1))
    if mask is not None:
        m = mask[..., None] if mask.ndim == probs.ndim - 1 else mask
        probs = probs * m
        y = y * m
    if square or mask is not None:
        # exact reference formulas (squared stats / masked tn are not
        # expressible via the sum identities below)
        tp = probs * y
        fp = probs * (1 - y)
        fn = (1 - probs) * y
        tn = (1 - probs) * (1 - y)
        if square:
            tp, fp, fn, tn = tp**2, fp**2, fn**2, tn**2
        return (
            jnp.sum(tp, axis=axes),
            jnp.sum(fp, axis=axes),
            jnp.sum(fn, axis=axes),
            jnp.sum(tn, axis=axes),
        )
    # hot path (train-step dice): one elementwise product + three cheap
    # reductions instead of four whole-tensor products — tp = sum(p*y),
    # fp = sum(p) - tp, fn = sum(y) - tp, tn = count - sp - sy + tp. Cuts
    # the HBM traffic of the loss ~3x (the products dominate at nnU-Net
    # batch sizes) and its backward even more.
    tp = jnp.sum(probs * y, axis=axes)
    sp = jnp.sum(probs, axis=axes)
    sy = jnp.sum(y, axis=axes)
    count = np.prod([probs.shape[a] for a in axes], dtype=np.float64)
    return tp, sp - tp, sy - tp, jnp.asarray(count, probs.dtype) - sp - sy + tp


def soft_dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    batch_dice: bool = False,
    do_bg: bool = False,
    smooth: float = 1e-5,
    mask: jnp.ndarray | None = None,
    axis_reduce: str = "mean",
    probs_input: bool = False,
) -> jnp.ndarray:
    """SoftDiceLoss (ref: dice_loss.py:201-250): 1 - mean Dice over classes
    (background dropped unless do_bg), optional batch-dice (statistics summed
    over the batch axis before the ratio — the DDP trainer's global batch
    dice, ref: nnUNetTrainerV2_DDP.py:247-280, maps to a psum of tp/fp/fn).

    `probs_input=True` skips the softmax — used for dice on bilinear-warped
    one-hot maps (the reference's seg_registered_memory component,
    ref: SegFlowGaussian.py(trainer):1482-1488; it pushes the warped one-hot
    through its softmax nonlin, which distorts probabilities — we use the
    warped one-hot directly)."""
    probs = logits if probs_input else jax.nn.softmax(logits, axis=-1)
    axes = tuple(range(0, probs.ndim - 1)) if batch_dice else tuple(range(1, probs.ndim - 1))
    tp, fp, fn, _ = get_tp_fp_fn_tn(probs, target, axes=axes, mask=mask)
    nominator = 2 * tp + smooth
    denominator = 2 * tp + fp + fn + smooth
    dc = nominator / denominator  # (C,) if batch_dice else (N, C)
    if not do_bg:
        dc = dc[..., 1:]
    return 1 - jnp.mean(dc)


def cross_entropy_loss(
    logits: jnp.ndarray, target: jnp.ndarray, ignore_index: int | None = None
) -> jnp.ndarray:
    """RobustCrossEntropy (ref: crossentropy.py:5); channels-last."""
    # CE without gather: -logp[target] == logsumexp(logits) - logits[target],
    # and logits[target] = sum(logits * onehot) fuses into elementwise ops.
    # take_along_axis lowers to a TPU gather (and scatter-add in the
    # backward), which dominated the train-step loss cost.
    tgt = jnp.clip(target, 0).astype(jnp.int32)
    y = (tgt[..., None] == jnp.arange(logits.shape[-1], dtype=jnp.int32)).astype(logits.dtype)
    nll = jax.nn.logsumexp(logits, axis=-1) - jnp.sum(logits * y, axis=-1)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(logits.dtype)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(nll)


def topk_cross_entropy_loss(logits, target, k_percent: float = 10.0):
    """TopK loss: mean CE over the hardest k% voxels (ref: TopK_loss.py:20)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    flat = nll.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100))
    vals, _ = jax.lax.top_k(flat, k)
    return jnp.mean(vals)


def focal_loss(logits, target, gamma: float = 2.0, alpha: float = 0.25):
    """Focal loss (ref: focal_loss.py:22)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    return jnp.mean(-alpha * (1 - pt) ** gamma * logpt)


def dice_and_ce_loss(
    logits, target, weight_ce: float = 1.0, weight_dice: float = 1.0,
    batch_dice: bool = True, smooth: float = 1e-5,
):
    """DC_and_CE (ref: dice_loss.py:436); the nnUNetTrainerV2 default uses
    batch_dice for 2D and smooth 1e-5 (ref: nnUNetTrainer.py:259)."""
    return weight_ce * cross_entropy_loss(logits, target) + weight_dice * soft_dice_loss(
        logits, target, batch_dice=batch_dice, smooth=smooth
    )


def deep_supervision_weights(num_outputs: int, mask_last: bool = True) -> np.ndarray:
    """1/2^i weights, normalized; lowest resolution(s) masked out below a
    minimum feature-map size in the reference — here the lowest level is
    dropped when mask_last (ref: nnUNetTrainerV2.py:78-90).

    Returns HOST (numpy) values: deep_supervision_loss requires static
    weights so zero-weighted scales are dropped at trace time (a jnp array
    here would raise TracerArrayConversionError under jit)."""
    w = np.array([1 / (2**i) for i in range(num_outputs)])
    if mask_last and num_outputs > 2:
        w[-1] = 0.0
    return w / np.sum(w)


def deep_supervision_loss(outputs: Sequence[jnp.ndarray], targets: Sequence[jnp.ndarray], loss_fn, weights=None):
    """MultipleOutputLoss2 (ref: deep_supervision.py:24): weighted sum of the
    loss at each scale; `targets` are the seg maps downsampled per scale.

    Weights are kept STATIC (host floats) and zero-weighted scales are
    skipped at trace time: a traced-zero multiply still emits the whole
    scale's loss+backward into the program, and on the v5e that tipped XLA
    into a 60% slower train step for certain scale counts (measured in
    tools/bench_epoch2d.py: 6-scale 195 ms/iter vs 122 ms with the zero
    scale dropped — same math, same gradients)."""
    if weights is None:
        weights = deep_supervision_weights(len(outputs))
    weights = np.asarray(weights)  # must be static (host) values
    total = 0.0
    for i, (o, t) in enumerate(zip(outputs, targets)):
        if float(weights[i]) != 0.0:
            total = total + float(weights[i]) * loss_fn(o, t)
    return total


def fence_outputs(outputs):
    """optimization_barrier over a model's output tuple, applied right after
    `model.apply` on the training hot path.

    History: round-2 measurements first suggested the barrier (and its
    position) controlled a 124-vs-183 ms/iter step-time gap at Task002-2d
    geometry. Deeper digging (tools/bench_epoch2d.py; byte-identical jaxprs
    compiled to binaries 45% apart) showed the real cause is
    NONDETERMINISTIC backend compilation — every fresh compile is a
    scheduling-lottery draw, pinned afterwards by the compile cache. See
    csof_tpu/utils/autotune.py, which turns that into a knob. The fence is
    kept: it is an identity (its gradient is a barrier too), it keeps
    zero-weight DS heads alive, and the best draws observed were fenced
    programs."""
    single = not isinstance(outputs, (tuple, list))
    if single:
        return jax.lax.optimization_barrier((outputs,))[0]
    return jax.lax.optimization_barrier(tuple(outputs))


def downsample_seg_for_ds(
    seg: jnp.ndarray, pool_kernel_sizes: Sequence[Sequence[int]]
) -> list[jnp.ndarray]:
    """Downsample an integer seg map to every deep-supervision scale via
    nearest/stride slicing (capability of DownsampleSegForDSTransform2,
    ref: nnunet/training/data_augmentation/downsampling.py)."""
    out = [seg]
    cur = seg
    for strides in pool_kernel_sizes:
        slicer = (slice(None),) + tuple(slice(None, None, s) for s in strides)
        cur = cur[slicer]
        out.append(cur)
    return out[:-1]  # heads exist down to (num_pool-1) scales below full res


def generalized_dice_loss(
    logits: jnp.ndarray, target: jnp.ndarray, smooth: float = 1e-5
) -> jnp.ndarray:
    """GDL: class statistics weighted by 1/volume^2 (ref: dice_loss.py:26
    `GDL`), so small structures count as much as large ones."""
    probs = jax.nn.softmax(logits, axis=-1)
    axes = tuple(range(0, probs.ndim - 1))
    tp, fp, fn, _ = get_tp_fp_fn_tn(probs, target, axes=axes)
    c = probs.shape[-1]
    y = one_hot(target, c) if target.ndim == probs.ndim - 1 else target
    vol = jnp.sum(y, axis=axes)
    w = 1.0 / (vol**2 + 1e-10)
    numer = jnp.sum(w * tp)
    denom = jnp.sum(w * (2 * tp + fp + fn))
    return 1 - 2 * (numer + smooth) / (denom + smooth)


def boundary_loss(logits: jnp.ndarray, distance_maps: jnp.ndarray) -> jnp.ndarray:
    """Boundary loss (Kervadec et al.): mean of softmax probabilities
    weighted by signed distance maps to the GT boundary (ref: nnunet/lib/
    boundary.py + boundary_utils.py; maps computed host-side, e.g. with
    Processor.get_strain_mask / scipy EDT).

    logits: (N, *sp, C); distance_maps: (N, *sp, C) signed distances
    (positive outside the structure)."""
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.mean(probs * distance_maps)


def contour_point_loss(
    points_pred: jnp.ndarray, points_gt: jnp.ndarray
) -> jnp.ndarray:
    """Differentiable symmetric chamfer distance between point sets
    (the reference's point_loss on warped contour points,
    ref: video.yaml `point_loss`, get_strain-style contour supervision).

    points_pred/gt: (P, ndim) / (Q, ndim)."""
    d2 = jnp.sum((points_pred[:, None, :] - points_gt[None, :, :]) ** 2, axis=-1)
    return (jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))) / 2.0


# ---------------------------------------------------------------------------
# Registration / flow losses
# ---------------------------------------------------------------------------


def ncc_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window: int = 9,
    eps: float = 1e-3,
    clip: tuple[float, float] | None = (0.001, 0.999),
    reduction: str = "mean",
) -> jnp.ndarray:
    """Windowed local normalized cross-correlation, returned as 1 - NCC
    (so ~0 for identical images). Ref: nnunet/lib/loss.py:15-75 computes
    local sums via a zero-padded conv with an all-ones kernel over a 9x9
    window, squares the correlation, clamps cc to [0.001, 0.999] and uses
    eps=1e-3 in the denominator; identical math here via depthwise sum-pool
    (reduce_window, "SAME" = zero padding like F.conv2d(padding=win//2)).

    pred/target: (N, *spatial, C) with C=1 typically; 2D or 3D.
    """
    ndim = pred.ndim - 2
    win = (1,) + (window,) * ndim + (1,)

    def local_sum(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, win, (1,) * (ndim + 2), "SAME"
        )

    win_size = float(window**ndim)
    i, j = pred.astype(jnp.float32), target.astype(jnp.float32)
    i_sum, j_sum = local_sum(i), local_sum(j)
    i2_sum, j2_sum = local_sum(i * i), local_sum(j * j)
    ij_sum = local_sum(i * j)
    i_mu, j_mu = i_sum / win_size, j_sum / win_size
    cross = ij_sum - j_mu * i_sum - i_mu * j_sum + i_mu * j_mu * win_size
    i_var = i2_sum - 2 * i_mu * i_sum + i_mu * i_mu * win_size
    j_var = j2_sum - 2 * j_mu * j_sum + j_mu * j_mu * win_size
    cc = (cross * cross) / (i_var * j_var + eps)
    if clip is not None:
        cc = jnp.clip(cc, clip[0], clip[1])
    if reduction == "none":
        # per-pixel loss map (ref: NCC(reduction=None), lib/loss.py:71-75) —
        # the canonical trainer masks this with the ED strain mask before
        # the mean (ref: SegFlowGaussian.py(trainer):1560-1566)
        return 1.0 - cc
    return 1.0 - jnp.mean(cc)


def _central_gradient(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Central difference 0.5*(x[i+1] - x[i-1]) with replicate padding at the
    ends — the semantics of kornia.filters.spatial_gradient3d(mode='diff')
    that the reference's smoothness losses are built on
    (ref: nnunet/lib/loss.py:103 / :155)."""
    lo = jnp.take(x, jnp.array([0]), axis=axis)
    hi = jnp.take(x, jnp.array([x.shape[axis] - 1]), axis=axis)
    xp = jnp.concatenate([lo, x, hi], axis=axis)
    n = x.shape[axis]
    fwd = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    bwd = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    return 0.5 * (fwd - bwd)


def spatial_gradient_penalty(
    flow: jnp.ndarray, order: int = 2, reduction: str = "mean",
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Mean squared spatial gradient of a dense flow field
    (ref: SpatialSmoothingLoss, lib/loss.py:80-128): central differences with
    replicate padding (kornia spatial_gradient3d 'diff' kernel = ±0.5),
    squared, averaged over the x and y derivative channels.

    flow: (N, H, W, 2) / (N, D, H, W, 3), or channel-major (N, 2, H, W) with
    channel_axis=1 (the TPU-friendly layout — see ops/warp.warp_image_cm);
    penalty over the non-batch, non-channel (spatial) axes only.
    """
    ch = channel_axis % flow.ndim
    spatial_axes = [a for a in range(1, flow.ndim) if a != ch]
    total = 0.0
    for ax in spatial_axes:
        d = _central_gradient(flow, axis=ax)
        total = total + jnp.abs(d) ** order
    m = jnp.mean(total / len(spatial_axes), axis=ch)  # mean over flow channels
    if reduction == "none":
        return m  # (N, *spatial) per-pixel map (ref reduction=None path)
    return jnp.mean(m)


def temporal_gradient_penalty(
    flow_seq: jnp.ndarray, order: int = 2, reduction: str = "mean",
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Mean squared temporal gradient over the frame axis
    (ref: TemporalSmoothingLoss, lib/loss.py:130-178): central difference
    along T with replicate padding, matching kornia spatial_gradient3d's
    z-derivative channel on a (B, C, T, H, W) arrangement.

    flow_seq: (T, N, H, W, 2) — leading time axis; channel-major layouts
    (e.g. (T, N, 2, H, W)) via channel_axis.
    """
    d = _central_gradient(flow_seq, axis=0)
    m = jnp.mean(jnp.abs(d) ** order, axis=channel_axis)  # mean over flow channels
    if reduction == "none":
        return m  # (T, N, *spatial) per-pixel map (ref reduction=None path)
    return jnp.mean(m)


def raft_sequence_loss(
    flow_preds: jnp.ndarray, flow_gt: jnp.ndarray, gamma: float = 0.8,
    valid: jnp.ndarray | None = None, max_flow: float = 400.0,
) -> jnp.ndarray:
    """Exponentially-weighted L1 over RAFT iterations
    (ref: nnMTLTrainerV2Raft.py:1522 sequence loss, torchvision recipe).

    flow_preds: (iters, N, H, W, 2); flow_gt: (N, H, W, 2).
    """
    n = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    v = (mag < max_flow).astype(jnp.float32)
    if valid is not None:
        v = v * valid.astype(jnp.float32)
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.mean(
        jnp.abs(flow_preds - flow_gt[None]), axis=-1
    )  # (iters, N, H, W)
    per_iter = jnp.sum(l1 * v[None], axis=(1, 2, 3)) / jnp.maximum(jnp.sum(v), 1.0)
    return jnp.sum(weights * per_iter)


def charbonnier_loss(pred, target, eps: float = 1e-3):
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps**2))
