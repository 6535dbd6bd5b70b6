"""SegFlow decoder deep supervision (VERDICT item 10).

The reference's Decoder2D emits per-stage auxiliary heads upsampled to full
resolution when deep_supervision is on (ref: nnunet/lib/decoder_alt.py:852-856)
and the trainer weights scales by 1/2^i normalized to sum 1
(ref: nnunet/training/network_training/SegFlowGaussian.py:376-381 via
MultipleOutputLoss2, ref: training/loss_functions/deep_supervision.py:24).
"""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.config.experiment import DataConfig, ExperimentConfig, SegFlowModelConfig
from csof_tpu.models.segflow import SegFlow
from csof_tpu.training.trainer import make_segflow_loss


def _cfg(ds: bool):
    return SegFlowModelConfig(
        out_encoder_dims=(4, 8, 16),
        d_model=16,
        bottleneck_heads=2,
        dim_feedforward=32,
        corr_radius=(1, 1, 1),
        corr_stride=(1, 1, 1),
        dtype="float32",
        deep_supervision=ds,
    )


def test_segflow_ds_output_shapes():
    model = SegFlow(cfg=_cfg(True), num_classes=4)
    video = jnp.asarray(np.random.RandomState(0).rand(3, 16, 16, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    # 3 encoder levels -> 2 decoder stages -> 1 intermediate DS head,
    # upsampled to full resolution (like the reference's stride-2^k
    # transposed-conv DS heads)
    assert len(out["seg_ds"]) == 1
    assert len(out["flow_ds"]) == 1
    assert out["seg_ds"][0].shape == (3, 16, 16, 4)
    assert out["flow_ds"][0].shape == (3, 2, 16, 16)  # channel-major
    # frame-0 identity anchor applies to DS flows too
    np.testing.assert_allclose(np.asarray(out["flow_ds"][0][0]), 0.0, atol=0)


def test_segflow_ds_off_keeps_param_tree():
    """DS params only exist when the flag is on — checkpoints trained
    without DS restore unchanged."""
    video = jnp.zeros((2, 16, 16, 1))
    p_off = SegFlow(cfg=_cfg(False), num_classes=4).init(jax.random.PRNGKey(0), video)
    p_on = SegFlow(cfg=_cfg(True), num_classes=4).init(jax.random.PRNGKey(0), video)
    names_on = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(p_on)}
    names_off = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(p_off)}
    assert names_off < names_on  # strictly more params with DS
    extra = names_on - names_off
    assert all("ds_head" in n for n in extra)


def _exp_cfg(ds: bool):
    return ExperimentConfig(
        model="segflow",
        segflow=_cfg(ds),
        data=DataConfig(video_length=3, batch_size=2),
    )


def _batch():
    rng = np.random.RandomState(1)
    video = rng.rand(2, 3, 16, 16, 1).astype(np.float32)
    seg = -np.ones((2, 3, 16, 16), np.int32)
    seg[:, 0] = rng.randint(0, 4, (2, 16, 16))
    mask = np.zeros((2, 3), np.float32)
    mask[:, 0] = 1
    return {
        "video": jnp.asarray(video),
        "seg": jnp.asarray(seg),
        "labeled_mask": jnp.asarray(mask),
    }


def test_segflow_ds_loss_runs_and_differs():
    batch = _batch()
    cfg = _exp_cfg(True)
    model = SegFlow(cfg=cfg.segflow, num_classes=4)
    params = model.init(jax.random.PRNGKey(0), batch["video"][0])
    loss_fn = make_segflow_loss(cfg, model)
    loss, aux = loss_fn(params, batch)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: loss_fn(p, batch)[0])(params)
    # DS heads must receive gradient signal
    gnorm = sum(
        float(jnp.sum(jnp.abs(g)))
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if "ds_head" in jax.tree_util.keystr(path)
    )
    assert gnorm > 0


def test_segflow_ds_weights_normalized():
    """With DS on, scale weights are 1/2^i normalized to sum 1: if every
    scale produced the SAME output, the weighted loss equals the single-scale
    loss (weight normalization sanity, matching MultipleOutputLoss2)."""
    ws = [1.0 / 2.0**i for i in range(3)]
    ws = [x / sum(ws) for x in ws]
    np.testing.assert_allclose(sum(ws), 1.0, rtol=1e-12)
    assert ws[0] > ws[1] > ws[2]
