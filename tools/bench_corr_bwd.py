import sys; sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax"
import numpy as np
import jax, jax.numpy as jnp
from tools._timing import time_state

B = 4  # training batch
cases = [
    ("l0_128x128x32_r4s2", (B, 128, 128, 32), 4, 2),
    ("l1_64x64x64_r4s1",   (B, 64, 64, 64),   4, 1),
    ("l2_32x32x128_r4s1",  (B, 32, 32, 128),  4, 1),
]
impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"  # pallas = v2 kernels
os.environ["CSOF_CORR_BWD"] = impl
from csof_tpu.ops.pallas.corr import _corr_bwd_pallas_v2, _make_corr_fn

for name, shp, r, s in cases:
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
    m = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
    k2 = (2 * r + 1) ** 2
    g = jnp.asarray(rng.rand(shp[0], shp[1], shp[2], k2), jnp.bfloat16)
    CH = 6
    fn = _make_corr_fn(r, s, False)
    def f(q, m, k):
        tot = jnp.float32(0.0)
        qq, mm = q, m
        for _ in range(CH):
            def loss(qq, mm):
                out = jax.vmap(lambda a, b: fn(a, b))(qq, mm)
                return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))
            l, (dq, dm) = jax.value_and_grad(loss, argnums=(0, 1))(qq, mm)
            tot = tot + l
            fb = jnp.tanh(dq.astype(jnp.float32))
            qq = (qq.astype(jnp.float32) + 0.001 * fb).astype(jnp.bfloat16)
            mm = (mm.astype(jnp.float32) + 0.001 * jnp.tanh(dm.astype(jnp.float32))).astype(jnp.bfloat16)
        sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)
        return (qq.astype(jnp.float32) * (1.0 + 2.0**-7*sign + tot*1e-30)).astype(jnp.bfloat16), mm, k + 1
    step = jax.jit(f)
    try:
        sec = time_state(step, (q, m, jnp.int32(0)), 6) / CH
        print(f"{impl} {name}: {sec*1e3:.3f} ms per fwd+bwd (B={B})", flush=True)
    except Exception as e:
        print(f"{impl} {name}: FAIL {type(e).__name__} {str(e)[:150]}", flush=True)
