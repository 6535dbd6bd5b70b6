"""Unsupervised domain adaptation (adversarial feature alignment).

Capability parity with the reference's UDA branch
(ref: nnunet/network_architecture/uda model + nnMTLTrainerV2UDA trainer,
adversarial keys in ref: nnunet/adversarial_acdc.yaml — do_adv/
adversarial_weight/discriminator_*): a segmentation model trains on labeled
source data while a patch discriminator pushes target-domain predictions to
be indistinguishable from source-domain ones (output-space alignment,
AdaptSegNet-style). Two optimizers alternate inside one jitted step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from csof_tpu.models.discriminator import (
    PatchDiscriminator,
    discriminator_loss,
    generator_adversarial_loss,
)
from csof_tpu.ops import losses as L


def make_uda_step(
    seg_apply: Callable,  # (params, x (N,H,W,C)) -> logits (N,H,W,classes)
    disc: PatchDiscriminator,
    seg_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    adversarial_weight: float = 0.001,
):
    """Returns jittable `step(state, batch)` where state =
    (seg_params, seg_opt, disc_params, disc_opt) and batch =
    {"source": x_s, "source_seg": y_s, "target": x_t}."""

    def seg_loss_fn(seg_params, disc_params, batch):
        src_logits = seg_apply(seg_params, batch["source"])
        sup = L.dice_and_ce_loss(src_logits, batch["source_seg"])
        tgt_logits = seg_apply(seg_params, batch["target"])
        tgt_probs = jax.nn.softmax(tgt_logits, axis=-1)
        fool = generator_adversarial_loss(disc.apply(disc_params, tgt_probs))
        return sup + adversarial_weight * fool, {"sup": sup, "adv_gen": fool}

    def disc_loss_fn(disc_params, seg_params, batch):
        src_probs = jax.nn.softmax(seg_apply(seg_params, batch["source"]), axis=-1)
        tgt_probs = jax.nn.softmax(seg_apply(seg_params, batch["target"]), axis=-1)
        real = disc.apply(disc_params, jax.lax.stop_gradient(src_probs))
        fake = disc.apply(disc_params, jax.lax.stop_gradient(tgt_probs))
        return discriminator_loss(real, fake)

    def step(state, batch):
        seg_params, seg_opt, disc_params, disc_opt = state
        (seg_l, aux), seg_grads = jax.value_and_grad(seg_loss_fn, has_aux=True)(
            seg_params, disc_params, batch
        )
        updates, seg_opt = seg_tx.update(seg_grads, seg_opt, seg_params)
        seg_params = optax.apply_updates(seg_params, updates)

        disc_l, disc_grads = jax.value_and_grad(disc_loss_fn)(disc_params, seg_params, batch)
        d_updates, disc_opt = disc_tx.update(disc_grads, disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        metrics = {"seg_loss": seg_l, "disc_loss": disc_l, **aux}
        return (seg_params, seg_opt, disc_params, disc_opt), metrics

    return step


def init_uda_state(seg_params, disc: PatchDiscriminator, example_probs, seg_tx, disc_tx, key):
    disc_params = disc.init(key, example_probs)
    return (seg_params, seg_tx.init(seg_params), disc_params, disc_tx.init(disc_params))
