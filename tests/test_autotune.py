"""Compile-draw autotuning: numerical no-op guarantee + plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.utils.autotune import autotune_step, jiggle_term
import pytest


def test_jiggle_is_exact_noop_at_zero():
    loss = jnp.float32(1.2345678)
    for k in range(1, 6):
        out = loss + jiggle_term(jnp.float32(0.0), k)
        assert float(out) == float(loss)  # bit-exact: 0.0 * c == 0.0


def test_jiggle_survives_jit_and_grad():
    def f(x, jiggle, k):
        return jnp.sum(x**2) + jiggle_term(jiggle, k)

    x = jnp.arange(4.0)
    g0 = jax.grad(f)(x, jnp.float32(0.0), 1)
    g1 = jax.jit(jax.grad(f), static_argnums=2)(x, jnp.float32(0.0), 3)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_autotune_step_picks_working_binary():
    def make_step(k):
        @jax.jit
        def step(x, jiggle):
            return jnp.sum(x * 2.0) + jiggle_term(jiggle, k)

        return step

    x = jnp.ones((8,))
    step, records = autotune_step(
        make_step, lambda: (x, jnp.float32(0.0)), draws=2, reps=2, verbose=False
    )
    assert len(records) == 2
    assert float(step(x, jnp.float32(0.0))) == 16.0


@pytest.mark.slow
def test_trainer_autotune_env(tmp_path, monkeypatch):
    """CSOF_AUTOTUNE_DRAWS compiles K binaries, picks one, and restores the
    training state so the timed steps do not advance training."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_trainer_and_parallel import seg_batches, seg_config

    from csof_tpu.training.trainer import Trainer

    monkeypatch.setenv("CSOF_AUTOTUNE_DRAWS", "2")
    cfg = seg_config()
    it = seg_batches()
    tr = Trainer(cfg, tmp_path, num_classes=2, example_batch=next(it))
    hist = tr.run_training(it, seg_batches(), log_fn=lambda s: None)
    assert len(hist.train_losses) == 2
    # the picked step must actually train
    assert hist.train_losses[-1] <= hist.train_losses[0] + 0.05
