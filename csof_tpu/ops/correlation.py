"""Correlation volumes: all-pairs pyramid (RAFT) + local windows (SegFlow).

The reference lost its correlation modules (`nnunet.lib.raft` is absent from
the tree; see SURVEY.md 'repo health warning') — the architecture is pinned
by torchvision `raft_large`
(ref: nnunet/training/network_training/nnMTLTrainerV2Raft.py:97,104) and by
the per-scale `CorrVolume(radius, stride)` calls in the flagship model
(ref: nnunet/network_architecture/SegFlowGaussian.py:255-269). Both are
rebuilt here TPU-first:

- the all-pairs volume is one batched matmul (pure MXU work),
- the pyramid lookup is a bilinear gather of (2r+1)^2 window points,
- the *local* correlation volume is computed by shifted elementwise products
  (no gather at all — VPU-friendly, fuses into the surrounding convs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csof_tpu.ops.warp import grid_sample


def all_pairs_correlation(f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C), (H, W, C) -> (H, W, H, W) scaled dot-product correlation.

    corr[h, w, h', w'] = <f1[h, w], f2[h', w']> / sqrt(C).
    """
    h, w, c = f1.shape
    corr = jnp.einsum(
        "ac,bc->ab",
        f1.reshape(-1, c),
        f2.reshape(-1, c),
        preferred_element_type=jnp.float32,
    )
    return corr.reshape(h, w, h, w) / jnp.sqrt(jnp.float32(c))


def correlation_pyramid(corr: jnp.ndarray, num_levels: int = 4) -> list[jnp.ndarray]:
    """Average-pool the *target* dims of the (H, W, H, W) volume into a
    pyramid [(H, W, H/2^l, W/2^l)], l = 0..num_levels-1 (RAFT Sec. 3.2)."""
    h, w = corr.shape[:2]
    levels = [corr]
    cur = corr.reshape(h * w, *corr.shape[2:], 1)
    for _ in range(num_levels - 1):
        cur = jax.lax.reduce_window(
            cur, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        levels.append(cur.reshape(h, w, *cur.shape[1:3]))
    return levels


def lookup_correlation(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Sample each pyramid level in a (2r+1)^2 window around `coords`.

    pyramid: list of (H, W, Hl, Wl); coords: (H, W, 2) current target
    positions in level-0 units. Returns (H, W, L*(2r+1)^2) features.

    TPU-first formulation: NO gathers. The bilinear window lookup separates
    per axis into a *two-hot weighted selector matrix* — for query n and
    window row dy, Ry[n, dy, y] = (1-fy)*[y == y0+dy] + fy*[y == y0+dy+1]
    (and likewise Cx for columns) — so the whole lookup is two batched
    matmuls out = Ry @ vol @ Cx^T riding the MXU. Out-of-range window taps
    produce all-zero selector rows, which IS zero-padded bilinear sampling,
    so no explicit masking or padding is needed. Replaces the previous
    separable-lerp + integer-window gather (gathers are scalar-unit work on
    TPU and dominated RAFT's runtime).
    """
    h, w = coords.shape[:2]
    n = h * w
    r = radius
    k = 2 * r + 1
    dyx = jnp.arange(-r, r + 1, dtype=jnp.int32)
    out = []
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        vol = corr.reshape(n, hl, wl)
        c = coords.reshape(n, 2) / (2.0**lvl)
        cy, cx = c[:, 0], c[:, 1]
        y0f, x0f = jnp.floor(cy), jnp.floor(cx)
        fy = (cy - y0f)[:, None, None]
        fx = (cx - x0f)[:, None, None]
        y0 = y0f.astype(jnp.int32)[:, None, None] + dyx[None, :, None]  # (n, K, 1)
        x0 = x0f.astype(jnp.int32)[:, None, None] + dyx[None, :, None]
        ygrid = jnp.arange(hl, dtype=jnp.int32)[None, None, :]
        xgrid = jnp.arange(wl, dtype=jnp.int32)[None, None, :]
        ry = (ygrid == y0) * (1 - fy) + (ygrid == y0 + 1) * fy  # (n, K, Hl)
        cxm = (xgrid == x0) * (1 - fx) + (xgrid == x0 + 1) * fx  # (n, K, Wl)
        tmp = jnp.einsum("nky,nyx->nkx", ry, vol, preferred_element_type=jnp.float32)
        val = jnp.einsum(
            "nkx,njx->nkj", tmp, cxm, preferred_element_type=jnp.float32
        )  # (n, Kdy, Kdx)
        out.append(val.reshape(h, w, k * k))
    return jnp.concatenate(out, axis=-1)


def lookup_correlation_gather(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Previous separable-lerp + window-gather implementation, kept as the
    semantic reference for tests (one integer gather of the K^2 window per
    query after factoring out the shared fractional offset).
    """
    h, w = coords.shape[:2]
    r = radius
    d = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-r, r + 1, dtype=coords.dtype),
            jnp.arange(-r, r + 1, dtype=coords.dtype),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 2)  # ((2r+1)^2, 2)

    out = []
    n = h * w
    k = 2 * r + 1
    doff = d.reshape(k * k, 2).astype(jnp.int32)
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        centroid = coords.reshape(n, 2) / (2.0**lvl)  # (n, 2) window centers
        vol = corr.reshape(n, hl, wl)
        # TPU gathers are scalar-unit work, so minimize them: all K^2 window
        # points of one query share the SAME fractional offset, so bilinear
        # separates into two whole-tensor lerps (VPU) + ONE integer gather of
        # the K^2 window per query (instead of 4 corner gathers per point).
        cy, cx = centroid[:, 0], centroid[:, 1]
        y0f, x0f = jnp.floor(cy), jnp.floor(cx)
        fy = (cy - y0f)[:, None, None]
        fx = (cx - x0f)[:, None, None]
        # zero margin sized so ANY window whose footprint touches the volume
        # keeps unclipped indices (clip slack = window radius + lerp tap)
        m = 2 * r + 2
        volp = jnp.pad(vol, ((0, 0), (m, m + 1), (m, m + 1)))
        lerp_y = (1 - fy) * volp[:, :-1, :] + fy * volp[:, 1:, :]
        lerp = (1 - fx) * lerp_y[:, :, :-1] + fx * lerp_y[:, :, 1:]
        # integer window gather; bases clipped so indices stay in the padded
        # array — fully-out-of-range windows are masked to 0, exactly
        # matching zero-padded bilinear sampling
        y0 = jnp.clip(y0f.astype(jnp.int32), -(r + 1), hl + r)
        x0 = jnp.clip(x0f.astype(jnp.int32), -(r + 1), wl + r)
        masked = (y0f < -(r + 1)) | (y0f > hl + r) | (x0f < -(r + 1)) | (x0f > wl + r)
        yy = y0[:, None] + doff[None, :, 0] + m  # (n, K^2)
        xx = x0[:, None] + doff[None, :, 1] + m
        nn = jnp.broadcast_to(jnp.arange(n)[:, None], yy.shape)
        vals = lerp[nn, yy, xx] * (~masked)[:, None].astype(lerp.dtype)
        out.append(vals.reshape(h, w, -1))
    return jnp.concatenate(out, axis=-1)


def local_correlation_volume(
    query: jnp.ndarray, memory: jnp.ndarray, radius: int = 4, stride: int = 1,
    impl: str = "auto", q_cm: bool = False, out_cm: bool = False,
    m_cm: bool = False,
) -> jnp.ndarray:
    """Local correlation between two (H, W, C) feature maps.

    out[h, w, k] = <query[h, w], memory[h + s*dy, w + s*dx]> / sqrt(C) for
    (dy, dx) in the (2r+1)^2 window with dilation `stride`
    (capability of the reference's per-scale `CorrVolume(radius, stride)`,
    ref: SegFlowGaussian.py:255-269). Computed with `pltpu`-friendly shifted
    products (rolls + multiplies) instead of gathers.

    q_cm=True: `query` arrives CHANNEL-MAJOR (C, H, W). The Pallas kernel
    wants channel-major operands, and ~80% of its per-call cost on the real
    backend is the layout glue around it (0.42 of 0.52 ms at SegFlow level
    shapes, B=8 — measured with kernel replaced by a no-op); a caller that
    loops over frames can hoist the query-side transpose out of the loop
    and batch it over T (models/segflow.py does exactly that).
    """
    if impl == "auto":
        # CSOF_CORR_IMPL picks jnp | einsum | pallas; unset -> pallas on a
        # TPU backend, jnp elsewhere. The pallas kernel (custom_vmap batch
        # grid + custom VJP with a shifted-slice XLA backward) is both
        # faster and leaner than the jnp path in training too: at SegFlow
        # b=4/t=6 the jnp-corr train step OOMs the v5e by 69 MB while the
        # pallas one runs at 105 frames/s (tools/bench_segflow_train.py).
        import os

        impl = os.environ.get("CSOF_CORR_IMPL")
        if impl not in ("jnp", "einsum", "pallas"):
            import jax as _jax

            impl = "pallas" if _jax.default_backend() == "tpu" else "jnp"
    if impl == "pallas":
        # VMEM-resident kernel: one HBM read of query+memory instead of
        # (2r+1)^2 shifted slices (measured ~1/3 of SegFlow runtime on v5e
        # with the jnp path; see tools/bench_explore.py)
        from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas

        return local_correlation_volume_pallas(
            query, memory, radius, stride, q_cm=q_cm, out_cm=out_cm, m_cm=m_cm
        )
    if q_cm:
        # only the pallas path consumes/produces channel-major natively
        query = jnp.moveaxis(query, 0, -1)
    if m_cm:
        memory = jnp.moveaxis(memory, 0, -1)
    if impl == "einsum":
        out = _local_corr_einsum(query, memory, radius, stride)
        return jnp.moveaxis(out, -1, 0) if out_cm else out
    h, w, c = query.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(c))
    k = 2 * radius + 1
    pad = radius * stride
    # f32 accumulation regardless of input dtype (matches the pallas
    # kernel's accumulation; callers may pass bf16 activations directly)
    qf = query.astype(jnp.float32)
    mem = jnp.pad(memory.astype(jnp.float32), ((pad, pad), (pad, pad), (0, 0)))
    outs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            oy, ox = (dy * stride + pad), (dx * stride + pad)
            shifted = jax.lax.dynamic_slice(mem, (oy, ox, 0), (h, w, c))
            outs.append(jnp.sum(qf * shifted, axis=-1) * scale)
    stacked = jnp.stack(outs, axis=0 if out_cm else -1).astype(query.dtype)
    return stacked  # ((2r+1)^2, H, W) if out_cm else (H, W, (2r+1)^2)


def _local_corr_einsum(query, memory, radius: int, stride: int):
    """MXU formulation: im2col window patches + one per-pixel matvec
    einsum('hwc,hwck->hwk') — the contraction feeds the MXU as a batched
    matmul instead of (2r+1)^2 shifted VPU passes."""
    h, w, c = query.shape
    k = 2 * radius + 1
    pad = radius * stride
    mem = jnp.pad(memory, ((pad, pad), (pad, pad), (0, 0)))
    # extract k*k dilated patches: (1, H, W, C*k*k) ordered [c, ky, kx]
    patches = jax.lax.conv_general_dilated_patches(
        mem[None],
        filter_shape=(k, k),
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0].reshape(h, w, c, k * k)
    out = jnp.einsum(
        "hwc,hwck->hwk", query.astype(jnp.float32), patches.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return (out / jnp.sqrt(jnp.float32(c))).astype(query.dtype)


def local_correlation_volume_batch(
    query: jnp.ndarray, memory: jnp.ndarray, radius: int = 4, stride: int = 1
) -> jnp.ndarray:
    return jax.vmap(lambda q, m: local_correlation_volume(q, m, radius, stride))(query, memory)
