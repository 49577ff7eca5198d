"""Bisect the b=1024 fused-decode-loop compile-helper crash.

bench_decode_batch.py: the TinyLlama engine_decode_loop compiles and runs
at b=768 but dies at b=1024 with the opaque `HTTP 500: tpu_compile_helper
subprocess exit code 1` — at only ~7.4 GB resident, so NOT the HBM crash
class. This script AOT-compiles loop variants with components toggled to
pin the trigger:

  b896            does the crash start between 768 and 1024?
  b1024_greedy    the failing configuration (fused argmax lm_head)
  b1024_sampling  per-slot sampling args (no fused argmax kernel)
  b1024_steps8    shorter fused loop
  b1024_attn512   full-window attention (no tail mode)
  b1024_nopiggy   (greedy is already piggyback-free without payload)

Usage: timeout 1800 python scripts/bisect_b1024_crash.py
Writes artifacts/b1024_bisect.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
from functools import partial

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)
    _cd = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "results", "jitcache")
    jax.config.update("jax_compilation_cache_dir", _cd)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from flash_attention_softmax_n_tpu.engine.engine import (
        engine_decode_loop,
    )
    from flash_attention_softmax_n_tpu.models import (
        DecoderConfig,
        init_decoder_params,
    )
    from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
    from flash_attention_softmax_n_tpu.quant.kv_cache import (
        init_quantized_kv_cache,
    )

    cfg = DecoderConfig(
        vocab_size=32000, d_model=2048, n_layers=22, n_heads=32,
        n_kv_heads=4, d_ff=5632, max_seq_len=2048, softmax_n=1.0,
        dtype=jnp.bfloat16)
    params = quantize_decoder_weights(
        init_decoder_params(cfg, jax.random.PRNGKey(0)), bits=8)

    def avals(batch):
        sds = lambda a: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), a)
        cache = init_quantized_kv_cache(cfg.n_layers, batch, cfg.n_kv_heads,
                                        512, cfg.head_dim, mode="int8")
        cache["lengths"] = jnp.zeros((batch,), jnp.int32)
        cache.pop("length", None)
        return (sds(params), sds(cache),
                jax.ShapeDtypeStruct((batch,), jnp.int32),
                jax.ShapeDtypeStruct((batch,), jnp.bool_))

    out = {"hw": "v5e-1"}

    def trial(name, batch, *, steps=64, attn_len=256, sampling=False):
        ap, ac, at, aa = avals(batch)
        kw = {}
        if sampling:
            kw = {"temps": jax.ShapeDtypeStruct((batch,), jnp.float32),
                  "rng": jax.ShapeDtypeStruct((2,), jnp.uint32)}
        try:
            fn = jax.jit(partial(engine_decode_loop, cfg=cfg,
                                 num_steps=steps, attn_len=attn_len),
                         donate_argnames=("cache",))
            fn.lower(params=ap, tokens=at, cache=ac, active=aa,
                     **kw).compile()
            out[name] = "compiles"
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
        print(f"{name}: {out[name]}", flush=True)

    trial("b768_greedy", 768)
    trial("b896_greedy", 896)
    trial("b1024_greedy", 1024)
    trial("b1024_sampling", 1024, sampling=True)
    trial("b1024_steps8", 1024, steps=8)
    trial("b1024_attn512", 1024, attn_len=512)
    trial("b1152_greedy", 1152)
    # round-5 refinement: the first pass showed b896@64 FAILS while
    # b1024@8 COMPILES — the wall is a (batch x steps) interaction, not
    # batch alone. Pin the product envelope:
    trial("b896_steps32", 896, steps=32)
    trial("b896_steps48", 896, steps=48)
    trial("b1024_steps16", 1024, steps=16)
    trial("b1024_steps32", 1024, steps=32)
    trial("b1024_steps48", 1024, steps=48)
    trial("b1280_steps32", 1280, steps=32)
    trial("b768_steps96", 768, steps=96)

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/b1024_bisect.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
