"""Direct comparison vs the reference's documented epoch times.

ref: documentation/expected_epoch_times.md — Task002_Heart 3d_fullres epoch
(250 train iterations) takes 47.16 s on A100-40GB / 81.92 s on V100-32GB /
123.27 s on RTX-2080ti. We rebuild the same training geometry (nnU-Net
Task002 plans: patch 80x192x160, batch 2, base 32 features, 5 pool stages
with aniso first/last) and time OUR jitted train step on the v5e chip.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REF_EPOCH_A100 = 47.16
REF_EPOCH_V100 = 81.92
ITERS_PER_EPOCH = 250  # ref: network_trainer.py:109


def main(dtype="bfloat16", batch=2, fwd_only=False, draw=0, ds=True,
         loss_kind="dice_ce", remat_levels=None, remat=True, norm="instance",
         remat_policy="full"):
    import jax
    import jax.numpy as jnp
    import optax

    from csof_tpu.models.unet import GenericUNet
    from csof_tpu.ops import losses as L

    # Task002_Heart 3d_fullres geometry (nnU-Net defaults for this task)
    patch = (80, 192, 160)
    pools = ((1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    kernels = ((1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    net = GenericUNet(
        num_classes=3, base_num_features=32, pool_kernel_sizes=pools,
        conv_kernel_sizes=kernels, deep_supervision=ds, norm=norm,
        dtype=jnp.dtype(dtype),
        remat=remat and not fwd_only,  # stored activations of the b2 f32-norm grad program were 62 GB
        remat_levels=remat_levels,
        remat_policy=remat_policy,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *patch, 1), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (batch, *patch)), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x[:1])
    tx = optax.chain(optax.clip_by_global_norm(12.0), optax.sgd(0.01, momentum=0.99, nesterov=True))
    opt = tx.init(params)

    kinds = {
        "dice_ce": L.dice_and_ce_loss,
        "dice": lambda o, t: L.soft_dice_loss(o, t, batch_dice=True),
        "ce": L.cross_entropy_loss,
    }

    def loss_fn(p, jiggle):
        outs = net.apply(p, x)
        if not isinstance(outs, tuple):
            outs = (outs,)
        outs = L.fence_outputs(outs)
        targets = L.downsample_seg_for_ds(y, pools)[: len(outs)]
        loss = L.deep_supervision_loss(outs, targets, kinds[loss_kind])
        if draw > 0:
            from csof_tpu.utils.autotune import jiggle_term

            loss = loss + jiggle_term(jiggle, draw)
        return loss

    zero = jnp.float32(0.0)
    if fwd_only:
        # The remote backend elides re-executions with byte-identical args
        # (see tools/bench_conv3d.py): scale the f32 params by 1 +/- 2^-12
        # alternating each rep so the state bytes provably change (f32
        # partial products never cycle back, unlike bf16).
        @jax.jit
        def step(params, opt):
            outs = net.apply(params, x)
            if not isinstance(outs, tuple):
                outs = (outs,)
            probe = sum(o.astype(jnp.float32).sum() for o in outs)
            k = opt  # reuse the opt slot as an int32 rep counter
            sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
            scale = 1.0 + 2.0**-12 * sign + probe * 1e-30
            params = jax.tree_util.tree_map(lambda p: p * scale, params)
            return params, k + 1, probe

        opt = jnp.int32(0)
    else:
        @jax.jit
        def step(params, opt):
            loss, grads = jax.value_and_grad(loss_fn)(params, zero)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

    flops = None
    try:
        flops = step.lower(params, opt).compile().cost_analysis().get("flops")
    except Exception:
        pass
    # fetch-synchronized timing: block_until_ready is unreliable on the
    # axon backend (tools/_timing.py); the loss fetch forces the whole
    # state-threaded chain to actually execute
    params, opt, loss = step(params, opt)
    float(loss)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, loss = step(params, opt)
    float(loss)
    sec_per_iter = (time.perf_counter() - t0) / reps * (2 / batch)
    epoch_sec = sec_per_iter * ITERS_PER_EPOCH
    rec = {
        "config": f"task002_heart_3dfullres_epoch_b{batch}"
        + ("_fwd" if fwd_only else "")
        + (f"_draw{draw}" if draw else "")
        + ("" if ds else "_nods")
        + ("" if loss_kind == "dice_ce" else f"_{loss_kind}")
        + ("" if remat_levels is None else f"_remat{remat_levels}")
        + ("" if remat else "_noremat")
        + ("" if remat_policy == "full" else f"_{remat_policy}")
        + ("" if norm == "instance" else f"_norm-{norm}"),
        "sec_per_iter": round(sec_per_iter, 3),
        "epoch_sec_v5e": round(epoch_sec, 1),
        "ref_epoch_sec_a100": REF_EPOCH_A100,
        "speedup_vs_a100": round(REF_EPOCH_A100 / epoch_sec, 2),
        "speedup_vs_v100": round(REF_EPOCH_V100 / epoch_sec, 2),
    }
    if flops:
        rec["tflops_per_iter"] = round(flops / 1e12, 2)
        rec["achieved_tflops"] = round(flops / 1e12 / (sec_per_iter * batch / 2), 1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import sys as _s

    kw = {}
    for a in _s.argv[1:]:
        if a == "fwd":
            kw["fwd_only"] = True
        elif a == "nods":
            kw["ds"] = False
        elif a in ("dice", "ce"):
            kw["loss_kind"] = a
        elif a.startswith("draw"):
            kw["draw"] = int(a[4:])
        elif a.startswith("rl"):
            kw["remat_levels"] = int(a[2:])
        elif a == "noremat":
            kw["remat"] = False
        elif a == "saveconv":
            kw["remat_policy"] = "save_conv"
        elif a.startswith("norm="):
            kw["norm"] = a[5:]
        else:
            kw["batch"] = int(a)
    main(**kw)
