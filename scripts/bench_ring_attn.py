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


def bench_train_step(out):
    """Full long-context TRAIN step (fwd+bwd+adamw) with the SP/ring path
    (VERDICT r3 item 7): one-device 'sp' mesh — ring traffic is a no-op at
    p=1, so this is the per-device compute a real ring step runs. remat
    keeps activation memory O(1) in depth at L=16k."""
    import dataclasses

    from flash_attention_softmax_n_tpu.models import (
        DecoderConfig,
        init_decoder_params,
    )
    from flash_attention_softmax_n_tpu.parallel import (
        make_mesh,
        make_train_step,
    )

    cfg0 = DecoderConfig(
        vocab_size=32000, d_model=1024, n_layers=8, n_heads=16,
        n_kv_heads=4, d_ff=2816, softmax_n=1.0, dtype=jnp.bfloat16,
        remat=True)
    mesh = make_mesh({"data": 1, "model": 1, "sp": 1})
    for l in (8192, 16384):
        cfg = dataclasses.replace(cfg0, max_seq_len=l)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, l), 0,
                                    cfg.vocab_size)
        try:
            init, step = make_train_step(cfg, mesh, learning_rate=1e-4,
                                         sp_axis="sp")
            p, o = init(params)
            t0 = time.time()
            p, o, loss = step(p, o, tokens)
            sync(loss)
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 5
            for _ in range(reps):
                p, o, loss = step(p, o, tokens)
            sync(loss)
            dt = (time.time() - t0) / reps
            # model flops: 6*N per token (fwd+bwd) + attention
            # 4*B*H*L^2*hd/2 causal x3 (fwd + 2x bwd)
            mf = 6 * n_params * l
            af = 3 * 4 * cfg.n_heads * l * l * cfg.head_dim / 2
            tf = (mf + af) / dt / 1e12
            row = {"ms": round(dt * 1e3, 1), "compile_s": round(compile_s, 1),
                   "tf_s": round(tf, 1), "loss": round(float(loss), 3),
                   "params_m": round(n_params / 1e6, 1)}
            out[f"train_step_L{l}"] = row
            print(f"train step L={l} ({n_params/1e6:.0f}M, remat, sp ring): "
                  f"{dt*1e3:.0f} ms = {tf:.1f} TF/s (attn is "
                  f"{af/(mf+af)*100:.0f}% of flops)", flush=True)
        except Exception as exc:  # noqa: BLE001
            out[f"train_step_L{l}"] = {"error": f"{type(exc).__name__}: "
                                       f"{str(exc)[:160]}"}
            print(f"train step L={l} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
        for leaf in jax.tree_util.tree_leaves((params, p, o)):
            try:
                leaf.delete()
            except Exception:  # noqa: BLE001
                pass


def main():
    import json

    print("backend:", jax.default_backend(), flush=True)
    out = {"hw": "v5e-1"}
    import os as _cache_os
    _cd = _cache_os.path.join(_cache_os.path.dirname(_cache_os.path.dirname(_cache_os.path.abspath(__file__))), 'results', 'jitcache')
    _cache_os.makedirs(_cd, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cd)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
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
                out[f"L{l}_{name}"] = {
                    "fwd_ms": round(dt_f * 1e3, 2),
                    "fwd_tf_s": round(fwd_tf / dt_f, 1),
                    "fwdbwd_ms": round(dt_g * 1e3, 2),
                    "fwdbwd_tf_s": round(3 * fwd_tf / dt_g, 1)}
                print(f"L={l} {name}: fwd {dt_f*1e3:.2f}ms "
                      f"({fwd_tf/dt_f:.1f} TF/s)  fwd+bwd {dt_g*1e3:.2f}ms "
                      f"({3*fwd_tf/dt_g:.1f} TF/s)",
                      flush=True)
            except Exception as exc:  # OOM at the biggest xla shapes
                rows.append((name, None, None))
                out[f"L{l}_{name}"] = {"error": f"{type(exc).__name__}"}
                print(f"L={l} {name}: FAILED {type(exc).__name__}: {exc}",
                      flush=True)
        ok = {n: (tf, tg) for n, tf, tg in rows if tf}
        if "ring-xla" in ok and "ring-pallas" in ok:
            print(f"L={l} pallas speedup: fwd "
                  f"{ok['ring-xla'][0]/ok['ring-pallas'][0]:.2f}x  "
                  f"fwd+bwd {ok['ring-xla'][1]/ok['ring-pallas'][1]:.2f}x",
                  flush=True)

    bench_train_step(out)
    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/ring_train.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
