"""Learning-rate schedules (optax).

Parity: poly LR `initial * (1 - ep/max)^0.9`
(ref: nnunet/training/network_training/nnUNetTrainerV2.py:407
`maybe_update_lr` + nnunet/training/learning_rate/poly_lr.py), cosine
annealing with warmup (ref: nnunet/training/network_training/
SegFlowGaussian.py:599-627, video.yaml scheduler/warmup_percent/eta_min).
"""

from __future__ import annotations

import optax

from csof_tpu.config.experiment import OptimConfig


def poly_schedule(initial_lr: float, total_steps: int, exponent: float = 0.9):
    def schedule(step):
        frac = 1.0 - step / max(total_steps, 1)
        return initial_lr * (frac**exponent)

    return schedule


def cosine_with_warmup(initial_lr: float, total_steps: int, warmup_percent: float, eta_min: float):
    warmup = max(1, int(total_steps * warmup_percent))
    return optax.warmup_cosine_decay_schedule(
        init_value=initial_lr * 1e-2,
        peak_value=initial_lr,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=eta_min,
    )


def build_schedule(cfg: OptimConfig, total_steps: int):
    if cfg.scheduler == "poly":
        return poly_schedule(cfg.initial_lr, total_steps, cfg.poly_exponent)
    if cfg.scheduler == "cosine":
        return cosine_with_warmup(cfg.initial_lr, total_steps, cfg.warmup_percent, cfg.eta_min)
    return lambda step: cfg.initial_lr


def build_optimizer(cfg: OptimConfig, total_steps: int) -> optax.GradientTransformation:
    """SGD-nesterov(0.99) or AdamW, both behind grad-clip 12
    (ref: nnUNetTrainerV2.py:171,273; SegFlowGaussian.py:599-627,2226)."""
    schedule = build_schedule(cfg, total_steps)
    if cfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.sgd_momentum, nesterov=cfg.nesterov),
        )
    else:
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
