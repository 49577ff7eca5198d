import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.models import DecoderConfig, init_decoder_params
from flash_attention_softmax_n_tpu.engine.engine import engine_decode_loop
from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
from flash_attention_softmax_n_tpu.quant.kv_cache import init_quantized_kv_cache

cfg = DecoderConfig(
    vocab_size=32000, d_model=2048, n_layers=22, n_heads=32,
    n_kv_heads=4, d_ff=5632, max_seq_len=2048, softmax_n=1.0,
    dtype=jnp.bfloat16,
)
params = init_decoder_params(cfg, jax.random.PRNGKey(0))
N = 32
MAXLEN = 512


def run(name, p, quant, B):
    if quant:
        c = init_quantized_kv_cache(cfg.n_layers, B, cfg.n_kv_heads, MAXLEN,
                                    cfg.head_dim, mode="int8")
    else:
        shape = (cfg.n_layers, B, cfg.n_kv_heads, MAXLEN, cfg.head_dim)
        c = {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}
    c["lengths"] = jnp.full((B,), 128, jnp.int32)
    c.pop("length", None)
    tok = jnp.full((B,), 17, jnp.int32)
    active = jnp.ones((B,), bool)
    loop = jax.jit(partial(engine_decode_loop, cfg=cfg, num_steps=N),
                   donate_argnames=("cache",))
    toks, c, a = loop(params=p, tokens=tok, cache=c, active=active)
    float(jnp.sum(toks.astype(jnp.float32)))
    toks, c, a = loop(params=p, tokens=toks[:, -1], cache=c, active=a)
    float(jnp.sum(toks.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(2):
        toks, c, a = loop(params=p, tokens=toks[:, -1], cache=c, active=a)
    float(jnp.sum(toks.astype(jnp.float32)))
    dt = (time.time() - t0) / 2 / N
    print(f"{name} b={B}: {dt*1e3:.2f} ms/step -> {B/dt:.0f} tok/s", flush=True)


mode = sys.argv[1] if len(sys.argv) > 1 else "both"
qparams = quantize_decoder_weights(params, bits=8) if mode in ("both", "int8") else None
for B in (8, 16, 32, 64):
    if mode in ("both", "dense"):
        run("dense", params, False, B)
    if mode in ("both", "int8"):
        run("int8", qparams, True, B)
