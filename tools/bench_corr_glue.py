"""Per-call cost of the pallas corr kernel vs its layout glue (TPU).

Late-round-3 finding: a corr call costs ~0.52 ms at ALL three SegFlow level
shapes (16x different data volumes) at B=8 — fixed per-call overhead, not
data. Replacing the kernel with a no-op but keeping the moveaxis/pad/slice
glue still costs 0.34-0.46 ms: ~80% of the call is layout work around the
kernel. This motivated the q_cm channel-major query path
(csof_tpu/ops/correlation.py) that hoists the query transpose out of the
temporal loop.

Usage: python tools/bench_corr_glue.py [corr|glue|jnp]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

B = 8
CASES = [
    ("l0_128x128x32_r4s2", (B, 128, 128, 32), 4, 2),
    ("l1_64x64x64_r4s1", (B, 64, 64, 64), 4, 1),
    ("l2_32x32x128_r4s1", (B, 32, 32, 128), 4, 1),
]
CH = 12  # chained calls per timed step (matches T=12 steps of the loop)


def _loop(step_body, x_shape):
    """Elision-proof chain: elementwise feedback of each call's output into
    the next call's input (tools/_timing.py fetch-synced timing)."""
    import jax
    import jax.numpy as jnp

    from tools._timing import time_state

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(*x_shape), jnp.bfloat16)
    m = jnp.asarray(rng.rand(*x_shape), jnp.bfloat16)

    def f(q, m, k):
        tot = jnp.float32(0.0)
        qq = q
        for _ in range(CH):
            out = step_body(qq, m)
            of = out.astype(jnp.float32)
            tot = tot + jnp.mean(of)
            fb = jnp.tanh(jnp.mean(of, axis=-1))
            qq = (qq.astype(jnp.float32) * (1.0 + 0.001 * fb[..., None])).astype(
                jnp.bfloat16
            )
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return (
            (qq.astype(jnp.float32) * (1.0 + 2.0**-7 * sign + tot * 1e-30)).astype(
                jnp.bfloat16
            ),
            m,
            k + 1,
        )

    step = jax.jit(f)
    return time_state(step, (q, m, jnp.int32(0)), 8) / CH


def main(mode: str):
    import jax.numpy as jnp

    from csof_tpu.ops.correlation import local_correlation_volume

    for name, shp, r, s in CASES:
        if mode in ("corr", "jnp"):
            impl = "pallas" if mode == "corr" else "jnp"

            def body(qq, m, r=r, s=s, impl=impl):
                import jax

                return jax.vmap(
                    lambda a, b: local_correlation_volume(
                        a, b, radius=r, stride=s, impl=impl
                    )
                )(qq, m)

        else:  # glue: the transposes/pads WITHOUT the kernel
            pad = r * s
            w = shp[2]
            wpad = (w + 127) // 128 * 128

            def body(qq, m, pad=pad, w=w, wpad=wpad, shp=shp):
                cm = jnp.moveaxis(qq, -1, 1)
                cm = jnp.pad(cm, ((0, 0), (0, 0), (pad, pad), (0, wpad - w)))
                cm = cm + jnp.bfloat16(1.0)  # stands in for the kernel
                return jnp.moveaxis(cm[:, :, pad : pad + shp[1], :w], 1, -1)

        sec = _loop(body, shp)
        print(f"{mode} {name}: {sec*1e3:.3f} ms per B={B} call", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "corr")
