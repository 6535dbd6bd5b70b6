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
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        centroid = coords / (2.0**lvl)  # (H, W, 2)
        pts = (centroid[:, :, None, :] + d[None, None, :, :]).reshape(n, -1, 2)
        vol = corr.reshape(n, hl, wl)
        # bilinear via 4 flat gathers (ONE XLA gather per corner — a vmap of
        # per-pixel grid_sample lowers to thousands of tiny gathers and is
        # ~50x slower on TPU)
        y, x = pts[..., 0], pts[..., 1]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy, fx = y - y0, x - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        nn = jnp.broadcast_to(jnp.arange(n)[:, None], y0i.shape)
        acc = 0.0
        for dy2, wy in ((0, 1 - fy), (1, fy)):
            for dx2, wx in ((0, 1 - fx), (1, fx)):
                yy = y0i + dy2
                xx = x0i + dx2
                valid = (yy >= 0) & (yy < hl) & (xx >= 0) & (xx < wl)
                vals = vol[nn, jnp.clip(yy, 0, hl - 1), jnp.clip(xx, 0, wl - 1)]
                acc = acc + vals * wy * wx * valid.astype(vals.dtype)
        out.append(acc.reshape(h, w, -1))
    return jnp.concatenate(out, axis=-1)


def local_correlation_volume(
    query: jnp.ndarray, memory: jnp.ndarray, radius: int = 4, stride: int = 1,
    impl: str = "auto",
) -> jnp.ndarray:
    """Local correlation between two (H, W, C) feature maps.

    out[h, w, k] = <query[h, w], memory[h + s*dy, w + s*dx]> / sqrt(C) for
    (dy, dx) in the (2r+1)^2 window with dilation `stride`
    (capability of the reference's per-scale `CorrVolume(radius, stride)`,
    ref: SegFlowGaussian.py:255-269). Computed with `pltpu`-friendly shifted
    products (rolls + multiplies) instead of gathers.
    """
    if impl == "auto":
        # CSOF_CORR_IMPL picks jnp | einsum | pallas. v5e notes
        # (tools/bench_explore.py): the shifted-slice jnp path costs ~1/3 of
        # SegFlow runtime; the pallas kernel matches numerics standalone but
        # pallas-inside-vmap(scan) hangs this environment's remote compile
        # service; einsum maps the contraction onto the MXU via im2col.
        import os

        impl = os.environ.get("CSOF_CORR_IMPL", "jnp")
        if impl not in ("jnp", "einsum", "pallas"):
            impl = "jnp"
    if impl == "pallas":
        # VMEM-resident kernel: one HBM read of query+memory instead of
        # (2r+1)^2 shifted slices (measured ~1/3 of SegFlow runtime on v5e
        # with the jnp path; see tools/bench_explore.py)
        from csof_tpu.ops.pallas.corr import local_correlation_volume_pallas

        return local_correlation_volume_pallas(query, memory, radius, stride)
    if impl == "einsum":
        return _local_corr_einsum(query, memory, radius, stride)
    h, w, c = query.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(c))
    k = 2 * radius + 1
    pad = radius * stride
    mem = jnp.pad(memory, ((pad, pad), (pad, pad), (0, 0)))
    outs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            oy, ox = (dy * stride + pad), (dx * stride + pad)
            shifted = jax.lax.dynamic_slice(mem, (oy, ox, 0), (h, w, c))
            outs.append(jnp.sum(query * shifted, axis=-1) * scale)
    return jnp.stack(outs, axis=-1)  # (H, W, (2r+1)^2)


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
    return out / jnp.sqrt(jnp.float32(c))


def local_correlation_volume_batch(
    query: jnp.ndarray, memory: jnp.ndarray, radius: int = 4, stride: int = 1
) -> jnp.ndarray:
    return jax.vmap(lambda q, m: local_correlation_volume(q, m, radius, stride))(query, memory)
