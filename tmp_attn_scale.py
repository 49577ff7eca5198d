import sys
import time

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.kernels.decode_attention import decode_attention_n
from flash_attention_softmax_n_tpu.quant.kv_cache import quantize_kv

H, HD, S, NL, REP = 16, 128, 512, 16, 10
key = jax.random.PRNGKey(0)
sc = HD ** -0.5


def timeit(name, fn, *args, n=5):
    for _ in range(2):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/n/REP*1e3:.3f} ms", flush=True)


def repeat(body):
    @jax.jit
    def outer(*args):
        def step(q, _):
            return body(q, *args[1:]), None
        out, _ = jax.lax.scan(step, args[0], None, length=REP)
        return out
    return outer


def mk(impl, quant, ic=None, bs=None):
    def body(q, *xs):
        def inner(q, layer):
            if quant:
                kk, sk, vv, sv = layer
                o = decode_attention_n(q, kk, vv, lens, k_scales=sk,
                                       v_scales=sv, softmax_n_param=1.0,
                                       scale=sc, k_new=q, v_new=q,
                                       implementation=impl,
                                       int8_compute=ic, block_s=bs)
            else:
                kk, vv = layer
                o = decode_attention_n(q, kk, vv, lens, softmax_n_param=1.0,
                                       scale=sc, k_new=q, v_new=q,
                                       implementation=impl, block_s=bs)
            return o.astype(jnp.bfloat16), None
        q, _ = jax.lax.scan(inner, q, xs)
        return q
    return body


B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
lens = jnp.full((B,), 384, jnp.int32)
q = jax.random.normal(key, (B, H, HD), jnp.bfloat16)
kcs = 0.3 * jax.random.normal(key, (NL, B, H, S, HD), jnp.bfloat16)
vcs = 0.3 * jax.random.normal(key, (NL, B, H, S, HD), jnp.bfloat16)
kq, ks = quantize_kv(kcs, 8)
vq, vs = quantize_kv(vcs, 8)

print(f"--- B={B}, len=384/{S} ---")
timeit("dense xla   ", repeat(mk("xla", False)), q, kcs, vcs)
timeit("dense pallas", repeat(mk("pallas", False)), q, kcs, vcs)
timeit("int8 xla    ", repeat(mk("xla", True)), q, kq, ks, vq, vs)
timeit("int8 pallas ic", repeat(mk("pallas", True, ic=True)), q, kq, ks, vq, vs)
timeit("int8 pallas bf", repeat(mk("pallas", True, ic=False)), q, kq, ks, vq, vs)
