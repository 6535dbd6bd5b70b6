import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csof_tpu.ops.losses import boundary_loss, contour_point_loss, generalized_dice_loss


def test_gdl_perfect_zero():
    target = jnp.array([[[0, 1], [2, 1]]])
    logits = jax.nn.one_hot(target, 3) * 100.0
    assert float(generalized_dice_loss(logits, target)) == pytest.approx(0.0, abs=1e-3)
    # wrong prediction -> high loss
    wrong = jnp.roll(logits, 1, axis=-1)
    assert float(generalized_dice_loss(wrong, target)) > 0.5


def test_boundary_loss_direction():
    # prob mass inside (negative distance) -> lower loss than outside
    dist = jnp.array([[[[-1.0, 1.0]]]])  # (1,1,1,2): class0 inside, class1 outside
    inside_logits = jnp.array([[[[10.0, -10.0]]]])
    outside_logits = jnp.array([[[[-10.0, 10.0]]]])
    assert float(boundary_loss(inside_logits, dist)) < float(boundary_loss(outside_logits, dist))


def test_contour_point_loss():
    a = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    assert float(contour_point_loss(a, a)) == 0.0
    b = a + jnp.array([3.0, 4.0])  # each point shifted by distance 5
    # chamfer: (0,0)->nearest b = 25; (1,1)->nearest b = 13; mean = 19 per side
    assert float(contour_point_loss(a, b)) == pytest.approx(19.0)
