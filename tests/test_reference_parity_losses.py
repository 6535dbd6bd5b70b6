"""Loss-level numerical parity against the reference torch implementation.

Imports the reference's loss library directly (torch CPU,
ref: nnunet/training/loss_functions/dice_loss.py) and checks our jax losses
produce the same values on identical random inputs.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from csof_tpu.ops.losses import (
    cross_entropy_loss,
    get_tp_fp_fn_tn,
    soft_dice_loss,
)


@pytest.fixture(scope="module")
def ref_losses():
    from nnunet.training.loss_functions.crossentropy import RobustCrossEntropyLoss
    from nnunet.training.loss_functions.dice_loss import SoftDiceLoss
    from nnunet.training.loss_functions.dice_loss import get_tp_fp_fn_tn as ref_tpfpfn
    from nnunet.utilities.nd_softmax import softmax_helper

    return {
        "SoftDiceLoss": SoftDiceLoss,
        "RobustCE": RobustCrossEntropyLoss,
        "tpfpfn": ref_tpfpfn,
        "softmax_helper": softmax_helper,
    }


def _random_problem(seed=0, b=2, c=3, h=12, w=10):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, c, h, w).astype(np.float32)
    target = rng.randint(0, c, (b, 1, h, w)).astype(np.int64)
    return logits, target


def test_tp_fp_fn_parity(ref_losses):
    logits, target = _random_problem()
    probs_t = torch.softmax(torch.from_numpy(logits), dim=1)
    tp, fp, fn, tn = ref_losses["tpfpfn"](probs_t, torch.from_numpy(target), axes=(2, 3))
    # ours: channels-last probs, int target
    probs_j = jnp.moveaxis(jnp.asarray(np.asarray(probs_t)), 1, -1)
    tj, fj, nj, _ = get_tp_fp_fn_tn(probs_j, jnp.asarray(target[:, 0]))
    np.testing.assert_allclose(np.asarray(tj), tp.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fj), fp.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(nj), fn.numpy(), atol=1e-4)


@pytest.mark.parametrize("batch_dice", [False, True])
def test_soft_dice_parity(ref_losses, batch_dice):
    logits, target = _random_problem(seed=1)
    ref = ref_losses["SoftDiceLoss"](
        apply_nonlin=ref_losses["softmax_helper"], batch_dice=batch_dice, do_bg=False, smooth=1e-5
    )
    with torch.no_grad():
        # the fork's SoftDiceLoss returns 1 - dc, per-sample when
        # batch_dice=False (ref: dice_loss.py:212-237); reduce to the mean
        ref_val = float(ref(torch.from_numpy(logits), torch.from_numpy(target)).mean())
    ours = float(
        soft_dice_loss(
            jnp.moveaxis(jnp.asarray(logits), 1, -1),
            jnp.asarray(target[:, 0]),
            batch_dice=batch_dice,
            do_bg=False,
            smooth=1e-5,
        )
    )
    assert ours == pytest.approx(ref_val, abs=2e-4)


def test_cross_entropy_parity(ref_losses):
    logits, target = _random_problem(seed=2)
    ref = ref_losses["RobustCE"]()
    with torch.no_grad():
        ref_val = float(ref(torch.from_numpy(logits), torch.from_numpy(target)))
    ours = float(
        cross_entropy_loss(jnp.moveaxis(jnp.asarray(logits), 1, -1), jnp.asarray(target[:, 0]))
    )
    assert ours == pytest.approx(ref_val, abs=1e-4)
