"""Task002 2d epoch-time benchmark + ablations (utilization hunt).

ref: documentation/expected_epoch_times.md — Task002_Heart 2d epoch
(250 iterations, patch 320x256, batch 40, DS, SGD) takes 36.75 s on
A100-40GB. We rebuild the same training geometry and time OUR jitted train
step on the v5e chip, plus ablations that isolate where the time goes
(norm passes, deep supervision, loss, backward).

Usage: python tools/bench_epoch2d.py [variant ...]
Variants: base fwd nonorm groupnorm nods lossonly f32
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REF_EPOCH_A100 = 36.75
ITERS_PER_EPOCH = 250
PATCH = (320, 256)
BATCH = 40
NUM_CLASSES = 3

# Task002 2d plans geometry: 6 pool stages, all 3x3 kernels, base 32
POOLS = ((2, 2),) * 6
KERNELS = ((3, 3),) * 7


def build(dtype="bfloat16", norm="instance", ds=True):
    import jax
    import jax.numpy as jnp

    from csof_tpu.models.unet import GenericUNet

    net = GenericUNet(
        num_classes=NUM_CLASSES, base_num_features=32, pool_kernel_sizes=POOLS,
        conv_kernel_sizes=KERNELS, deep_supervision=ds, norm=norm,
        dtype=jnp.dtype(dtype),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, *PATCH, 1), jnp.float32)
    y = jnp.asarray(rng.randint(0, NUM_CLASSES, (BATCH, *PATCH)), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x[:1])
    return net, params, x, y


def make_step(net, tx, ds=True, loss_scales=None, loss_kind="dice_ce", barrier=True):
    import jax

    from csof_tpu.ops import losses as L

    kinds = {
        "dice_ce": L.dice_and_ce_loss,
        "dice": lambda o, t: L.soft_dice_loss(o, t, batch_dice=True),
        "ce": L.cross_entropy_loss,
    }
    scale_loss = kinds[loss_kind]

    def loss_fn(p, x, y, jiggle=None, draw=0):
        outs = net.apply(p, x)
        if not ds:
            outs = (outs,)
        if loss_scales is not None:
            outs = outs[:loss_scales]
        if barrier:
            outs = L.fence_outputs(outs)
        targets = L.downsample_seg_for_ds(y, POOLS)[: len(outs)]
        loss = L.deep_supervision_loss(outs, targets, scale_loss)
        if jiggle is not None:
            from csof_tpu.utils.autotune import jiggle_term

            loss = loss + jiggle_term(jiggle, draw)
        return loss

    import optax

    @jax.jit
    def step(params, opt, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    return step, loss_fn


def time_variant(name, **kw):
    import jax
    import optax

    fwd_only = kw.pop("fwd_only", False)
    loss_only = kw.pop("loss_only", False)
    loss_scales = kw.pop("loss_scales", None)
    loss_kind = kw.pop("loss_kind", "dice_ce")
    barrier = kw.pop("barrier", True)
    net, params, x, y = build(**kw)
    ds = kw.get("ds", True)
    tx = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.sgd(0.01, momentum=0.99, nesterov=True),
    )
    opt = tx.init(params)
    step, loss_fn = make_step(
        net, tx, ds=ds, loss_scales=loss_scales, loss_kind=loss_kind, barrier=barrier
    )

    import jax.numpy as jnp

    if fwd_only:
        # reduce to a scalar inside jit so the timing fetch is tiny; the
        # remote platform's block_until_ready does not synchronize, so we
        # time via a host transfer of a value that depends on every rep
        run = jax.jit(lambda p, x: sum(o.sum() for o in jax.tree.leaves(net.apply(p, x))))
        args = (params, x)
    elif loss_only:
        run = jax.jit(loss_fn)
        args = (params, x, y)
    else:
        run = None

    t_compile = time.perf_counter()
    if run is not None:
        out = run(*args)
        float(np.asarray(out))
        compile_s = time.perf_counter() - t_compile
        reps = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            out = run(*args)
            acc = out if acc is None else acc + out
        float(np.asarray(acc))  # host transfer = real synchronization
        dt = (time.perf_counter() - t0) / reps
        flops = None
        try:
            lowered = run.lower(*args).compile()
            flops = lowered.cost_analysis().get("flops")
        except Exception:
            pass
    else:
        params, opt, loss = step(params, opt, x, y)
        float(np.asarray(loss))
        compile_s = time.perf_counter() - t_compile
        reps = 10
        t0 = time.perf_counter()
        lsum = 0.0
        for _ in range(reps):
            params, opt, loss = step(params, opt, x, y)
            lsum = lsum + loss
        float(np.asarray(lsum))  # host transfer = real synchronization
        dt = (time.perf_counter() - t0) / reps
        flops = None
        try:
            lowered = step.lower(params, opt, x, y).compile()
            flops = lowered.cost_analysis().get("flops")
        except Exception:
            pass

    rec = {
        "variant": name,
        "sec_per_iter": round(dt, 4),
        "epoch_sec": round(dt * ITERS_PER_EPOCH, 1),
        "compile_s": round(compile_s, 1),
        "speedup_vs_a100": round(REF_EPOCH_A100 / (dt * ITERS_PER_EPOCH), 3),
    }
    if flops:
        rec["tflops_per_iter"] = round(flops / 1e12, 2)
        rec["achieved_tflops"] = round(flops / 1e12 / dt, 1)
        rec["mfu_vs_197tflops"] = round(flops / 1e12 / dt / 197, 3)
    print(json.dumps(rec), flush=True)


VARIANTS = {
    "base": dict(),
    "fwd": dict(fwd_only=True),
    "lossonly": dict(loss_only=True),
    "nonorm": dict(norm="none"),
    "groupnorm": dict(norm="group"),
    "nods": dict(ds=False),
    "f32": dict(dtype="float32"),
    # DS-cost isolation: heads in the model but loss on fewer scales
    "ds_fullloss": dict(loss_scales=1),
    "ds_2scales": dict(loss_scales=2),
    "ds_3scales": dict(loss_scales=3),
    "ds_4scales": dict(loss_scales=4),
    "ds_5scales": dict(loss_scales=5),
    "dice_only": dict(loss_kind="dice"),
    "ce_only": dict(loss_kind="ce"),
    "base_barrier": dict(barrier=True),
    "nobarrier": dict(barrier=False),
}


def autotune(draws=4):
    """Exploit the backend compile lottery (see csof_tpu/utils/autotune.py):
    compile `draws` numerically-identical variants of the base train step,
    time each, report the distribution and the pinned best."""
    import jax
    import jax.numpy as jnp
    import optax

    from csof_tpu.utils.autotune import autotune_step, jiggle_term

    net, params, x, y = build()
    tx = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.sgd(0.01, momentum=0.99, nesterov=True),
    )
    opt = tx.init(params)
    _, loss_fn = make_step(net, tx)

    def make_drawn_step(k):
        @jax.jit
        def step(params, opt, x, y, jiggle):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, x, y, jiggle=jiggle, draw=k)
            )(params)
            updates, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt2, loss

        return step

    zero = jnp.float32(0.0)
    step, records = autotune_step(
        make_drawn_step, lambda: (params, opt, x, y, zero), draws=draws, reps=10,
        sync=lambda out: float(np.asarray(out[2])),
    )
    best = min(r["sec_per_iter"] for r in records)
    print(json.dumps({
        "variant": "autotuned_base",
        "sec_per_iter": round(best, 4),
        "epoch_sec": round(best * ITERS_PER_EPOCH, 1),
        "speedup_vs_a100": round(REF_EPOCH_A100 / (best * ITERS_PER_EPOCH), 3),
        "draws_ms": [round(r["sec_per_iter"] * 1e3, 1) for r in records],
    }), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "fwd", "lossonly", "nods"]
    for n in names:
        if n.startswith("autotune"):
            autotune(int(n.split(":")[1]) if ":" in n else 4)
        else:
            time_variant(n, **VARIANTS[n])
