"""Ring-attention per-block compute bench: flash kernel vs XLA, real TPU.

Round-3 item (round-2 VERDICT weak #5 / next-round #6): ring attention's
per-block compute used to materialize (B, H, Lq, Lk) scores; it now routes
through the fused flash kernel (implementation='pallas'). Only one chip is
reachable here, so this measures the PER-BLOCK compute win on a 1-device
'sp' mesh (ring traffic is a no-op at p=1; the collective cost is identical
between the two routes, so the per-block delta IS the SP-step delta) at
long-context shapes, fwd and fwd+bwd, plus the non-ring fused kernel as the
ceiling.

Usage: timeout 1500 python scripts/bench_ring_attn.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from flash_attention_softmax_n_tpu.kernels.flash_attention import (
    flash_attention_n_fused,
)
from flash_attention_softmax_n_tpu.parallel.ring_attention import (
    ring_attention_n,
)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, reps=10):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])  # twice: relay relayout warmup
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    print("backend:", jax.default_backend(), flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    b, h, kvh, e = 1, 16, 4, 128
    for l in (4096, 8192, 16384):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = 0.3 * jax.random.normal(ks[0], (b, h, l, e), jnp.bfloat16)
        k = 0.3 * jax.random.normal(ks[1], (b, kvh, l, e), jnp.bfloat16)
        v = 0.3 * jax.random.normal(ks[2], (b, kvh, l, e), jnp.bfloat16)

        def ring(impl):
            def f(q, k, v):
                return ring_attention_n(
                    q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=1.0,
                    is_causal=True, implementation=impl)
            return f

        def fused(q, k, v):
            reps_ = h // kvh
            kk = jnp.repeat(k, reps_, 1)
            vv = jnp.repeat(v, reps_, 1)
            return flash_attention_n_fused(q, kk, vv, softmax_n_param=1.0,
                                           is_causal=True)

        def grad_of(f):
            def loss(q, k, v):
                return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)
            return jax.grad(loss, (0, 1, 2))

        # causal flops: ~half the square
        fwd_tf = 4 * b * h * l * l * e / 2 / 1e12
        rows = []
        for name, f in [("ring-xla", ring("xla")),
                        ("ring-pallas", ring("pallas")),
                        ("fused-kernel", fused)]:
            try:
                dt_f = bench(jax.jit(f), q, k, v)
                dt_g = bench(jax.jit(grad_of(f)), q, k, v)
                rows.append((name, dt_f, dt_g))
                print(f"L={l} {name}: fwd {dt_f*1e3:.2f}ms "
                      f"({fwd_tf/dt_f:.1f} TF/s)  fwd+bwd {dt_g*1e3:.2f}ms",
                      flush=True)
            except Exception as exc:  # OOM at the biggest xla shapes
                rows.append((name, None, None))
                print(f"L={l} {name}: FAILED {type(exc).__name__}: {exc}",
                      flush=True)
        ok = {n: (tf, tg) for n, tf, tg in rows if tf}
        if "ring-xla" in ok and "ring-pallas" in ok:
            print(f"L={l} pallas speedup: fwd "
                  f"{ok['ring-xla'][0]/ok['ring-pallas'][0]:.2f}x  "
                  f"fwd+bwd {ok['ring-xla'][1]/ok['ring-pallas'][1]:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
