"""U-Net construction/forward + loss-library tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from csof_tpu.config.plans import Plans, StagePlans
from csof_tpu.models.unet import GenericUNet, unet_from_plans
from csof_tpu.ops.losses import (
    cross_entropy_loss,
    deep_supervision_loss,
    deep_supervision_weights,
    dice_and_ce_loss,
    downsample_seg_for_ds,
    focal_loss,
    get_tp_fp_fn_tn,
    ncc_loss,
    raft_sequence_loss,
    soft_dice_loss,
    spatial_gradient_penalty,
    temporal_gradient_penalty,
    topk_cross_entropy_loss,
)


def tiny_plans_2d():
    return Plans(
        task="TaskTest",
        num_modalities=1,
        num_classes=3,
        all_classes=[1, 2, 3],
        normalization_schemes={0: "zscore"},
        use_mask_for_norm={0: True},
        transpose_forward=(0, 1, 2),
        transpose_backward=(0, 1, 2),
        base_num_features=8,
        plans_per_stage={
            0: StagePlans(
                batch_size=2,
                patch_size=(32, 32),
                current_spacing=(1.25, 1.25),
                original_spacing=(1.25, 1.25),
                pool_op_kernel_sizes=[[2, 2], [2, 2], [2, 2]],
                conv_kernel_sizes=[[3, 3]] * 4,
            )
        },
    )


def test_unet2d_forward_shapes():
    plans = tiny_plans_2d()
    net = unet_from_plans(plans, deep_supervision=True)
    x = jnp.zeros((2, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert isinstance(outs, tuple) and len(outs) == 3
    assert outs[0].shape == (2, 32, 32, 4)
    assert outs[1].shape == (2, 16, 16, 4)
    assert outs[2].shape == (2, 8, 8, 4)


def test_unet3d_forward_shapes_aniso_pools():
    net = GenericUNet(
        num_classes=3,
        base_num_features=4,
        pool_kernel_sizes=((1, 2, 2), (2, 2, 2)),
        conv_kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3)),
        deep_supervision=False,
    )
    x = jnp.zeros((1, 4, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 4, 16, 16, 3)


def test_dice_perfect_prediction_zero_loss():
    target = jnp.array([[[0, 1], [2, 1]]])  # (1, 2, 2)
    logits = jax.nn.one_hot(target, 3) * 100.0
    loss = soft_dice_loss(logits, target, batch_dice=True)
    assert float(loss) == pytest.approx(0.0, abs=1e-4)
    ce = cross_entropy_loss(logits, target)
    assert float(ce) == pytest.approx(0.0, abs=1e-4)


def test_tp_fp_fn_counts():
    target = jnp.array([[[0, 1], [1, 1]]])
    probs = jax.nn.one_hot(jnp.array([[[0, 1], [0, 1]]]), 2).astype(jnp.float32)
    tp, fp, fn, tn = get_tp_fp_fn_tn(probs, target)
    # class 1: predicted {1}, true {1,1,1} -> tp=2, fp=0, fn=1
    assert tp[0, 1] == 2 and fp[0, 1] == 0 and fn[0, 1] == 1
    # class 0: predicted at 2 positions, true at 1 -> tp=1, fp=1, fn=0
    assert tp[0, 0] == 1 and fp[0, 0] == 1 and fn[0, 0] == 0


def test_ds_weights_and_downsampling():
    w = deep_supervision_weights(4)
    assert float(w[-1]) == 0.0
    assert float(jnp.sum(w)) == pytest.approx(1.0)
    seg = jnp.zeros((1, 32, 32), jnp.int32)
    scales = downsample_seg_for_ds(seg, [[2, 2], [2, 2], [2, 2]])
    assert [s.shape for s in scales] == [(1, 32, 32), (1, 16, 16), (1, 8, 8)]


def test_ncc_identical_images_zero():
    # near-zero, not exactly zero: the reference clamps cc to <= 0.999 and
    # uses eps=1e-3 in the denominator (ref: lib/loss.py:68-70), so identical
    # images floor at ~1e-3
    x = jnp.asarray(np.random.RandomState(0).rand(1, 24, 24, 1).astype(np.float32))
    assert float(ncc_loss(x, x)) == pytest.approx(0.0, abs=2e-2)
    y = jnp.asarray(np.random.RandomState(1).rand(1, 24, 24, 1).astype(np.float32))
    assert float(ncc_loss(x, y)) > 0.1


def test_smoothness_penalties():
    # constant flow -> zero spatial penalty
    flow = jnp.ones((1, 16, 16, 2))
    assert float(spatial_gradient_penalty(flow)) == 0.0
    # linear ramp -> nonzero
    ramp = jnp.cumsum(jnp.ones((1, 16, 16, 2)), axis=1)
    assert float(spatial_gradient_penalty(ramp)) > 0
    seq = jnp.stack([flow, flow * 2.0])
    assert float(temporal_gradient_penalty(seq)) > 0
    assert float(temporal_gradient_penalty(jnp.stack([flow, flow]))) == 0.0


def test_raft_sequence_loss_weighting():
    gt = jnp.ones((1, 8, 8, 2))
    perfect = jnp.broadcast_to(gt, (3, 1, 8, 8, 2))
    assert float(raft_sequence_loss(perfect, gt)) == pytest.approx(0.0)
    # error only in the last iteration weighs more than the same error first
    bad_last = perfect.at[-1].add(1.0)
    bad_first = perfect.at[0].add(1.0)
    assert float(raft_sequence_loss(bad_last, gt)) > float(raft_sequence_loss(bad_first, gt))


def test_unet_overfits_tiny_problem():
    """3 gradient steps decrease DC+CE on a synthetic blob task."""
    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16, 1).astype(np.float32)
    y = np.zeros((2, 16, 16), np.int32)
    y[:, 4:12, 4:12] = 1
    x[:, 4:12, 4:12, 0] += 2.0
    net = GenericUNet(
        num_classes=2, base_num_features=4,
        pool_kernel_sizes=((2, 2),), conv_kernel_sizes=((3, 3), (3, 3)),
        deep_supervision=False,
    )
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return dice_and_ce_loss(net.apply(p, jnp.asarray(x)), jnp.asarray(y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("kernel", [(2, 2), (2, 2, 2), (1, 2, 2)])
def test_fast_conv_transpose_matches_flax(kernel):
    """blocks.ConvTranspose (matmul + depth-to-space) must be bit-compatible
    with flax nn.ConvTranspose in the kernel==strides VALID case: identical
    param tree (checkpoints transfer) and near-exact outputs."""
    from flax import linen as nn

    from csof_tpu.models.blocks import ConvTranspose

    nd = len(kernel)
    spatial = tuple(8 for _ in range(nd))
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, *spatial, 5), jnp.float32
    )
    fast = ConvTranspose(7, kernel_size=kernel, strides=kernel, padding="VALID")
    ref = nn.ConvTranspose(7, kernel_size=kernel, strides=kernel, padding="VALID")
    params = fast.init(jax.random.PRNGKey(1), x)
    # identical param tree -> the reference module accepts the same params
    y_fast = fast.apply(params, x)
    y_ref = ref.apply(params, x)
    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(
        np.asarray(y_fast), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    # and gradients flow (trainable drop-in)
    g = jax.grad(lambda p: fast.apply(p, x).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


@pytest.mark.slow
def test_remat_save_conv_policy_matches_full_remat():
    """remat_policy='save_conv' (store conv outputs, recompute only the
    norm+act epilogues) must produce the same loss and grads as full remat
    — it only changes WHAT the backward pass stores vs recomputes."""
    import numpy as np

    kw = dict(
        num_classes=3,
        base_num_features=4,
        pool_kernel_sizes=((1, 2, 2), (2, 2, 2)),
        conv_kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3)),
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 16, 16, 1), jnp.float32)

    def value_and_grad(net, p):
        def loss_fn(p):
            outs = net.apply(p, x)
            return sum(
                o.astype(jnp.float32).sum() * (0.1 ** i)
                for i, o in enumerate(outs)
            )

        return jax.jit(jax.value_and_grad(loss_fn))(p)

    n_full = GenericUNet(remat=True, **kw)
    n_sel = GenericUNet(remat=True, remat_policy="save_conv", **kw)
    params = n_full.init(jax.random.PRNGKey(0), x)
    # identical param trees: the policy is a backward-pass storage choice
    l_full, g_full = value_and_grad(n_full, params)
    l_sel, g_sel = value_and_grad(n_sel, params)
    assert float(l_full) == float(l_sel)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_sel)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-3, rtol=1e-2,  # bf16 rounding-order differences only
        )
