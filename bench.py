"""Benchmark: softmax-1 decode throughput with INT8 weights + INT8 KV cache.

BASELINE.json configs[3]: "Llama-style 1B decoder with softmax_1 attention,
INT8 KV-cache, continuous batching on 1 host". The reference publishes no
performance numbers (BASELINE.md), so ``vs_baseline`` is the speedup of the
quantized engine over the dense bf16 path on the same hardware — the
measurable claim of the north star (quantization must buy throughput, not
just memory).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/sec/chip", "vs_baseline": N}

Timing note: this environment's device relay acks block_until_ready early,
so every measurement is closed with a host transfer of a reduced scalar.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def build_model(dtype=jnp.bfloat16):
    from flash_attention_softmax_n_tpu.models import (
        DecoderConfig,
        init_decoder_params,
    )

    # TinyLlama-1.1B shape: the canonical Llama-style 1B decoder
    # (BASELINE.json configs[3]), GQA 32 query / 4 kv heads
    cfg = DecoderConfig(
        vocab_size=32000, d_model=2048, n_layers=22, n_heads=32,
        n_kv_heads=4, d_ff=5632, max_seq_len=2048, softmax_n=1.0,
        dtype=dtype,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def bench_decode(cfg, params, *, kv_quantization, batch=32, prompt_len=128,
                 decode_steps=64, max_len=512):
    """tokens/sec for continuous-batching decode, all slots active."""
    from functools import partial

    from flash_attention_softmax_n_tpu.engine.engine import (
        engine_decode,
        engine_prefill,
    )

    if kv_quantization:
        from flash_attention_softmax_n_tpu.quant.kv_cache import (
            init_quantized_kv_cache,
        )
        cache = init_quantized_kv_cache(cfg.n_layers, batch, cfg.n_kv_heads,
                                        max_len, cfg.head_dim,
                                        mode=kv_quantization)
    else:
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, cfg.head_dim)
        cache = {"k": jnp.zeros(shape, cfg.dtype),
                 "v": jnp.zeros(shape, cfg.dtype)}
    cache["lengths"] = jnp.zeros((batch,), jnp.int32)
    cache.pop("length", None)

    from flash_attention_softmax_n_tpu.engine.engine import engine_decode_loop

    prefill = jax.jit(partial(engine_prefill, cfg=cfg))

    rng = jax.random.PRNGKey(1)
    for slot in range(batch):
        rng, sub = jax.random.split(rng)
        tokens = jax.random.randint(sub, (1, prompt_len), 0, cfg.vocab_size)
        logits, cache = prefill(
            params=params, tokens=tokens,
            true_len=jnp.asarray(prompt_len, jnp.int32),
            slot=jnp.asarray(slot, jnp.int32), cache=cache)
    log(f"prefilled {batch} slots x {prompt_len} tokens")

    active = jnp.ones((batch,), bool)
    tok = jnp.full((batch,), 17, jnp.int32)

    # the serving configuration: decode_steps fused into one compiled
    # sample-feedback loop (host only between scheduling points), KV cache
    # donated so updates stay in place
    loop = jax.jit(partial(engine_decode_loop, cfg=cfg,
                           num_steps=decode_steps),
                   donate_argnames=("cache",))

    # two warmup invocations: the first compiles; the second absorbs the
    # one-time relayout/recompile that follows the first donated handoff
    t0 = time.time()
    toks, cache, active = loop(params=params, tokens=tok, cache=cache,
                               active=active)
    sync(toks)
    toks, cache, active = loop(params=params, tokens=toks[:, -1],
                               cache=cache, active=active)
    sync(toks)
    log(f"decode compile+warmup (2x{decode_steps} steps): "
        f"{time.time() - t0:.1f}s")

    t0 = time.time()
    n_timed = 2
    for _ in range(n_timed):
        toks, cache, active = loop(params=params, tokens=toks[:, -1],
                                   cache=cache, active=active)
    sync(toks)
    dt = (time.time() - t0) / n_timed
    tps = batch * decode_steps / dt
    log(f"kv={kv_quantization or 'dense'}: {decode_steps} steps x {batch} "
        f"slots in {dt:.3f}s -> {tps:.1f} tokens/sec")
    return tps


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    cfg, params = build_model()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"model: {n_params/1e9:.2f}B params, softmax_n={cfg.softmax_n}")

    # dense baseline: bf16 weights, bf16 KV
    dense_tps = bench_decode(cfg, params, kv_quantization=None)

    # quantized: INT8 weight-only + INT8 KV cache
    from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
    qparams = quantize_decoder_weights(params, bits=8)
    del params
    quant_tps = bench_decode(cfg, qparams, kv_quantization="int8")

    print(json.dumps({
        "metric": "softmax1 1.1B (TinyLlama-shape) decode tokens/sec/chip "
                  "(INT8 weights + INT8 KV, continuous batching b=32)",
        "value": round(quant_tps, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(quant_tps / dense_tps, 3),
    }))


if __name__ == "__main__":
    main()
