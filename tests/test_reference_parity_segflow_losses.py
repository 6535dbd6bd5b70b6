"""SegFlow loss-component goldens vs the reference's registration losses
(VERDICT item 5b).

The reference's NCC / SpatialSmoothingLoss / TemporalSmoothingLoss
(ref: nnunet/lib/loss.py:15-178) cannot be imported directly: the module
imports kornia (absent here) and hard-codes `.cuda()` calls. They are
re-stubbed below in torch from their documented math — 9x9 zero-padded
all-ones sum convolutions for NCC with eps=1e-3 and cc clamped to
[0.001, 0.999]; kornia spatial_gradient3d(mode='diff') = +-0.5 central
differences with replicate padding for the smoothness losses — and compared
against our jax implementations, plus a composed golden reproducing
`compute_losses_label` (ref: nnunet/training/network_training/
SegFlowGaussian.py:1478-1580): per-pixel loss maps masked by the ED strain
mask, mean-reduced, plus the warped-one-hot seg consistency term.

Known deliberate deviation (documented in ops/losses.py / trainer.py): the
reference pushes the bilinear-warped one-hot through its softmax-based
DC_and_CE loss (softmax of probabilities); we score the warped one-hot
directly with soft dice, so the composed golden uses that shared semantics
on both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from csof_tpu.ops.losses import (  # noqa: E402
    ncc_loss,
    soft_dice_loss,
    spatial_gradient_penalty,
    temporal_gradient_penalty,
)
from csof_tpu.ops.warp import warp_batch, warp_image  # noqa: E402


# ---------------------------------------------------------------------------
# torch re-stubs of the reference losses (clean-room, from lib/loss.py)
# ---------------------------------------------------------------------------


def ref_ncc_map(I, J, win=9, eps=1e-3):
    """NCC(reduction=None) per-pixel loss map (ref: lib/loss.py:15-75)."""
    weight = torch.ones(1, 1, win, win, dtype=I.dtype)
    pad = win // 2
    conv = lambda x: F.conv2d(x, weight, padding=pad)  # noqa: E731
    I_sum, J_sum = conv(I), conv(J)
    I2_sum, J2_sum, IJ_sum = conv(I * I), conv(J * J), conv(I * J)
    ws = float(win * win)
    u_I, u_J = I_sum / ws, J_sum / ws
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * ws
    I_var = I2_sum - 2 * u_I * I_sum + u_I * u_I * ws
    J_var = J2_sum - 2 * u_J * J_sum + u_J * u_J * ws
    cc = cross * cross / (I_var * J_var + eps)
    cc = torch.clamp(cc, 0.001, 0.999)
    return 1.0 - cc


def ref_spatial_gradient3d(x):
    """kornia spatial_gradient3d(mode='diff', order=1) semantics:
    (B, C, D, H, W) -> (B, C, 3, D, H, W) central differences (+-0.5) with
    replicate padding (ref dependency of lib/loss.py:103,155)."""
    b, c, d, h, w = x.shape
    xr = x.reshape(b * c, 1, d, h, w)
    xp = F.pad(xr, (1, 1, 1, 1, 1, 1), mode="replicate")
    gx = 0.5 * (xp[:, :, 1:-1, 1:-1, 2:] - xp[:, :, 1:-1, 1:-1, :-2])
    gy = 0.5 * (xp[:, :, 1:-1, 2:, 1:-1] - xp[:, :, 1:-1, :-2, 1:-1])
    gz = 0.5 * (xp[:, :, 2:, 1:-1, 1:-1] - xp[:, :, :-2, 1:-1, 1:-1])
    g = torch.cat([gx, gy, gz], dim=1)
    return g.reshape(b, c, 3, d, h, w)


def ref_spatial_smoothing_map(flow5):
    """SpatialSmoothingLoss(reduction=None) (ref: lib/loss.py:80-128):
    flow (T, B, C, H, W) -> per-pixel map (T, B, 1, H, W)."""
    g = ref_spatial_gradient3d(flow5.permute(1, 2, 0, 3, 4).contiguous()).pow(2)
    m = g[:, :, :2].mean(1).mean(1)  # (B, T, H, W)
    return m.permute(1, 0, 2, 3).contiguous()[:, :, None]


def ref_temporal_smoothing_map(flow5):
    """TemporalSmoothingLoss(reduction=None) (ref: lib/loss.py:130-178)."""
    g = ref_spatial_gradient3d(flow5.permute(1, 2, 0, 3, 4).contiguous()).pow(2)
    m = g[:, :, 2].mean(1)  # (B, T, H, W)
    return m.permute(1, 0, 2, 3).contiguous()[:, :, None]


def ref_warp(img, flow):
    """SpatialTransformer re-stub (ref: network_architecture/integration.py:
    37-81): img (B, C, H, W), flow (B, 2, H, W) in (dy, dx) channel order;
    align_corners=True, zero padding."""
    b, _, h, w = img.shape
    gy, gx = torch.meshgrid(
        torch.arange(h, dtype=img.dtype), torch.arange(w, dtype=img.dtype),
        indexing="ij",
    )
    grid = torch.stack([gy, gx])[None] + flow
    grid[:, 0] = 2 * (grid[:, 0] / (h - 1) - 0.5)
    grid[:, 1] = 2 * (grid[:, 1] / (w - 1) - 0.5)
    grid = grid.permute(0, 2, 3, 1)[..., [1, 0]]
    return F.grid_sample(img, grid, align_corners=True, padding_mode="zeros")


# ---------------------------------------------------------------------------
# component goldens
# ---------------------------------------------------------------------------


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_ncc_parity_mean_and_map():
    a, b = _rand((3, 1, 24, 20), 0), _rand((3, 1, 24, 20), 1)
    ref_map = ref_ncc_map(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    ours_map = np.asarray(
        ncc_loss(
            jnp.moveaxis(jnp.asarray(a), 1, -1),
            jnp.moveaxis(jnp.asarray(b), 1, -1),
            reduction="none",
        )
    )
    np.testing.assert_allclose(ours_map[..., 0], ref_map[:, 0], atol=2e-4)
    ours_mean = float(
        ncc_loss(jnp.moveaxis(jnp.asarray(a), 1, -1), jnp.moveaxis(jnp.asarray(b), 1, -1))
    )
    assert ours_mean == pytest.approx(float(ref_map.mean()), abs=2e-5)


def test_spatial_smoothing_parity():
    # flow stack (T, B, C, H, W) with B=1
    t, h, w = 4, 12, 10
    flow = (_rand((t, 1, 2, h, w), 2) - 0.5) * 4
    ref_map = ref_spatial_smoothing_map(torch.from_numpy(flow)).numpy()
    flow_j = jnp.moveaxis(jnp.asarray(flow[:, 0]), 1, -1)  # (T, H, W, 2)
    ours_map = np.asarray(spatial_gradient_penalty(flow_j, reduction="none"))
    np.testing.assert_allclose(ours_map, ref_map[:, 0, 0], atol=1e-5)
    assert float(spatial_gradient_penalty(flow_j)) == pytest.approx(
        float(ref_map.mean()), abs=1e-6
    )


def test_temporal_smoothing_parity():
    t, h, w = 5, 12, 10
    flow = (_rand((t, 1, 2, h, w), 3) - 0.5) * 4
    ref_map = ref_temporal_smoothing_map(torch.from_numpy(flow)).numpy()
    flow_j = jnp.moveaxis(jnp.asarray(flow), 2, -1)  # (T, B, H, W, 2)
    ours_map = np.asarray(temporal_gradient_penalty(flow_j, reduction="none"))
    np.testing.assert_allclose(ours_map, ref_map[:, :, 0], atol=1e-5)
    assert float(temporal_gradient_penalty(flow_j)) == pytest.approx(
        float(ref_map.mean()), abs=1e-6
    )


# ---------------------------------------------------------------------------
# composed golden: compute_losses_label
# ---------------------------------------------------------------------------


def test_compute_losses_label_composed_golden():
    """Reproduce the canonical masked composition
    (ref: SegFlowGaussian.py(trainer):1478-1580): NCC / spatial / temporal
    per-pixel maps x ED strain mask, mean-reduced, + warped-seg dice."""
    t, h, w = 4, 20, 16
    rng = np.random.RandomState(7)
    video = rng.rand(t, 1, 1, h, w).astype(np.float32)  # (T, B, C, H, W)
    cum = ((rng.rand(t - 1, 1, 2, h, w).astype(np.float32)) - 0.5) * 3
    mask0 = (rng.rand(1, 1, h, w) > 0.4).astype(np.float32)
    seg0 = rng.randint(0, 4, (h, w))
    seg_last = rng.randint(0, 4, (h, w))
    w_g, w_xy, w_z, w_m = 0.5, 1.0, 0.1, 0.2

    # ---- torch side (reference composition) ----
    vt = torch.from_numpy(video)
    ft = torch.from_numpy(cum)
    mt = torch.from_numpy(mask0)
    registered = torch.stack([ref_warp(vt[i + 1], ft[i]) for i in range(t - 1)])
    ncc_maps = torch.stack(
        [ref_ncc_map(registered[i], vt[0]) for i in range(t - 1)]
    )  # (T-1, B, 1, H, W)
    memory_flow = (ncc_maps * mt[None]).mean()
    sm_map = ref_spatial_smoothing_map(ft)
    memory_flow_reg = (sm_map * mt[None]).mean()
    tm_map = ref_temporal_smoothing_map(ft)
    temporal_reg = (tm_map * mt[None]).mean()
    oh_last = F.one_hot(torch.from_numpy(seg_last).long(), 4).permute(2, 0, 1)[None].float()
    warped_oh = ref_warp(oh_last, ft[-1])
    # shared soft-dice semantics (batch_dice, no bg, smooth 1e-5)
    y0 = F.one_hot(torch.from_numpy(seg0).long(), 4).permute(2, 0, 1)[None].float()
    axes = (0, 2, 3)
    tp = (warped_oh * y0).sum(axes)
    fp = (warped_oh * (1 - y0)).sum(axes)
    fn = ((1 - warped_oh) * y0).sum(axes)
    dc = (2 * tp + 1e-5) / (2 * tp + fp + fn + 1e-5)
    seg_reg_ref = 1 - dc[1:].mean()
    ref_total = float(
        w_g * memory_flow + w_xy * memory_flow_reg + w_z * temporal_reg + w_m * seg_reg_ref
    )

    # ---- jax side (our ops composed as in make_segflow_loss) ----
    video_j = jnp.moveaxis(jnp.asarray(video[:, 0]), 1, -1)  # (T, H, W, 1)
    cum_j = jnp.moveaxis(jnp.asarray(cum[:, 0]), 1, -1)  # (T-1, H, W, 2)
    m0 = jnp.asarray(mask0[0, 0])
    reg_j = warp_batch(video_j[1:], cum_j, padding="zeros")
    ncc = jnp.mean(
        ncc_loss(reg_j, jnp.broadcast_to(video_j[0], reg_j.shape), reduction="none")
        * m0[None, :, :, None]
    )
    sxy = jnp.mean(spatial_gradient_penalty(cum_j, reduction="none") * m0[None])
    st = jnp.mean(
        temporal_gradient_penalty(cum_j[:, None], reduction="none") * m0[None, None]
    )
    oh_last_j = jnp.moveaxis(jnp.asarray(np.asarray(oh_last[0])), 0, -1)
    warped_j = warp_image(oh_last_j, cum_j[-1], padding="zeros")
    seg_reg = soft_dice_loss(
        warped_j[None], jnp.asarray(seg0)[None], batch_dice=True, probs_input=True
    )
    ours_total = float(w_g * ncc + w_xy * sxy + w_z * st + w_m * seg_reg)

    assert ours_total == pytest.approx(ref_total, abs=5e-4)
    # components individually
    assert float(ncc) == pytest.approx(float(memory_flow), abs=2e-4)
    assert float(sxy) == pytest.approx(float(memory_flow_reg), abs=1e-5)
    assert float(st) == pytest.approx(float(temporal_reg), abs=1e-5)
    assert float(seg_reg) == pytest.approx(float(seg_reg_ref), abs=1e-4)
