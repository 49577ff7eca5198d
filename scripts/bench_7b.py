"""7B tokens/sec/chip — BASELINE.md's metric at its literal model scale.

BASELINE.json's metric is "tokens/sec/chip at 7B (softmax1 + INT8
KV-cache)"; bench.py measures the TinyLlama-1.1B shape (the largest the
dense-bf16 baseline comparison permits). This script runs the REAL 7B
geometry (Llama-7B: 32 layers, d=4096, 32 MHA heads, hd=128, ff=11008,
vocab 32000 — ~6.74B params) single-chip on v5e-16GB, which only fits
BECAUSE of int8 weight quantization (13.5 GB bf16 weights alone would
spill): int8 weights ~6.7 GB + int8 KV at b=48/max_len=512 ~6.4 GB.

Weights are initialized LEAF-BY-LEAF and quantized immediately so peak
HBM never holds the full bf16 pytree (largest transient: one 2.9 GB
w_gate leaf next to the growing int8 set).

Usage: timeout 1800 python scripts/bench_7b.py
Writes artifacts/bench_7b.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp


def init_7b_int8(cfg, rng):
    """init_decoder_params (models/decoder.py:92) mirrored leaf-by-leaf,
    each matmul weight quantized to int8 the moment it exists."""
    from flash_attention_softmax_n_tpu.quant.qtensor import quantize

    d, hd = cfg.d_model, cfg.head_dim
    nl, h, kvh, f = cfg.n_layers, cfg.n_heads, cfg.n_kv_heads, cfg.d_ff
    keys = jax.random.split(rng, 10)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(cfg.dtype)

    def qdense(key, shape, fan_in):
        w = jax.jit(dense, static_argnums=(1, 2))(key, shape, fan_in)
        q = jax.jit(lambda w: quantize(w, bits=8, axis=-2))(w)
        w.delete()
        return q

    params = {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),  # bf16 (gather)
        "layers": {
            "attn_norm": jnp.ones((nl, d), cfg.dtype),
            "wq": qdense(keys[1], (nl, d, h * hd), d),
            "wk": qdense(keys[2], (nl, d, kvh * hd), d),
            "wv": qdense(keys[3], (nl, d, kvh * hd), d),
            "wo": qdense(keys[4], (nl, h * hd, d), h * hd),
            "mlp_norm": jnp.ones((nl, d), cfg.dtype),
            "w_gate": qdense(keys[5], (nl, d, f), d),
            "w_up": qdense(keys[6], (nl, d, f), d),
            "w_down": qdense(keys[7], (nl, f, d), f),
        },
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": qdense(keys[8], (d, cfg.vocab_size), d),
    }
    return params


def init_7b_int8_synth(cfg, rng):
    """Timing-equivalent 7B int8 weights synthesized DIRECTLY in int8.

    Decode throughput is value-independent (the same trick bench.py's
    attn-SOL section uses for the KV cache), so the bench does not need
    the real init->quantize pipeline: uniform int8 values + constant
    per-output-channel scales of realistic magnitude (~absmax/127 of a
    fan-in-scaled normal) exercise the identical dequant-matmul path.
    Cuts the in-bench 7B/8B init from ~78s to seconds and never holds a
    bf16 leaf (VERDICT r4 item 1: the driver's cold 1380s budget).
    """
    from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

    d, hd = cfg.d_model, cfg.head_dim
    nl, h, kvh, f = cfg.n_layers, cfg.n_heads, cfg.n_kv_heads, cfg.d_ff
    keys = jax.random.split(rng, 10)

    def synth_q(key, shape, fan_in):
        q = jax.jit(lambda k: jax.random.randint(
            k, shape, -127, 128, dtype=jnp.int8))(key)
        # absmax of N(0, 1/fan_in) over a long axis ~ 4.5 sigma
        s = jnp.full(shape[:-2] + (1, shape[-1]),
                     4.5 * fan_in ** -0.5 / 127.0, jnp.float32)
        return QTensor(q, s, bits=8)

    def dense(key, shape, fan_in):
        return jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)
                                  * fan_in ** -0.5).astype(cfg.dtype))(key)

    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),  # bf16 (gather)
        "layers": {
            "attn_norm": jnp.ones((nl, d), cfg.dtype),
            "wq": synth_q(keys[1], (nl, d, h * hd), d),
            "wk": synth_q(keys[2], (nl, d, kvh * hd), d),
            "wv": synth_q(keys[3], (nl, d, kvh * hd), d),
            "wo": synth_q(keys[4], (nl, h * hd, d), h * hd),
            "mlp_norm": jnp.ones((nl, d), cfg.dtype),
            "w_gate": synth_q(keys[5], (nl, d, f), d),
            "w_up": synth_q(keys[6], (nl, d, f), d),
            "w_down": synth_q(keys[7], (nl, f, d), f),
        },
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": synth_q(keys[8], (d, cfg.vocab_size), d),
    }


def main():
    print("backend:", jax.default_backend(), flush=True)
    from flash_attention_softmax_n_tpu.models import DecoderConfig

    import bench as benchmod
    # bench.py defers its jax/jnp module globals to acquire_backend()
    # (relay-wedge hardening); bind them for library use
    benchmod.jax, benchmod.jnp = jax, jnp

    CONFIGS = [
        # Llama-(1/2)-7B: MHA — KV bytes are the 4x-of-GQA worst case
        ("7B-MHA (Llama-7B: 32L d4096 H32 KV32 hd128 ff11008 v32000)",
         DecoderConfig(
             vocab_size=32000, d_model=4096, n_layers=32, n_heads=32,
             n_kv_heads=32, d_ff=11008, max_seq_len=2048, softmax_n=1.0,
             dtype=jnp.bfloat16),
         (48, 32)),
        # Llama-3-8B: GQA-8, wide vocab — the shape production 7-8B
        # serving actually uses
        ("8B-GQA (Llama-3-8B: 32L d4096 H32 KV8 hd128 ff14336 v128256)",
         DecoderConfig(
             vocab_size=128256, d_model=4096, n_layers=32, n_heads=32,
             n_kv_heads=8, d_ff=14336, max_seq_len=2048, softmax_n=1.0,
             dtype=jnp.bfloat16),
         (96, 64)),
    ]

    out = {"hw": "v5e-1", "quant": "int8 W + int8 KV, softmax_n=1.0"}
    for label, cfg, batches in CONFIGS:
        t0 = time.time()
        params = init_7b_int8(cfg, jax.random.PRNGKey(0))
        print(f"{label}: init+quantize {time.time()-t0:.1f}s", flush=True)
        res = {}
        for batch in batches:
            try:
                tps = benchmod.bench_decode(
                    cfg, params, kv_quantization="int8", batch=batch,
                    prompt_len=128, decode_steps=32, max_len=512)
                res[f"tok_s_b{batch}"] = round(tps, 1)
                print(f"{label} b={batch}: {tps:.1f} tok/s/chip",
                      flush=True)
                break  # largest batch that compiles+fits is the number
            except Exception as e:
                res[f"b{batch}_error"] = (
                    f"{type(e).__name__}: {str(e)[:160]}")
                print(f"{label} b={batch} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
        out[label] = res
        for leaf in jax.tree.leaves(params):
            leaf.delete()
        del params

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bench_7b.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
