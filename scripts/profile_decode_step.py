"""Fused decode-loop step-time profile across batch sizes on the real TPU.

Churn runs the fused loop at the slot count (64) where the step is
weight-streaming bound (1.1 GB int8 / 614 GB/s = 1.8 ms floor), yet
chunk_sync says ~4.8 ms/step — this measures where the 2.7x goes:

- engine_decode_loop per-step time at b in {64, 128, 256, 512}, int8 W+KV,
  attn_len in {256, 512}: scaling with b separates fixed per-step cost
  (grid overhead, sampling, cache RMW) from per-token compute;
- the isolated pieces at b=64: the int8 matmul stack (qkv+o+gate-up+down at
  M=64), the lm_head argmax, and the XLA decode-attention matvec — each
  against its own SOL.

Usage: timeout 1500 python scripts/profile_decode_step.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp

from scripts._timing import sync, time_scan


def main():
    print("backend:", jax.default_backend(), flush=True)
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
    wbytes = 1.10e9  # int8 weight stream per step
    STEPS = 16

    for b in (64, 128, 256, 512):
        for attn_len in (256, 512):
            cache = init_quantized_kv_cache(
                cfg.n_layers, b, cfg.n_kv_heads, 512, cfg.head_dim,
                mode="int8")
            cache["lengths"] = jnp.full((b,), attn_len - STEPS - 8,
                                        jnp.int32)
            toks = jnp.zeros((b,), jnp.int32)
            active = jnp.ones((b,), bool)
            loop = jax.jit(partial(engine_decode_loop, cfg=cfg,
                                   num_steps=STEPS, attn_len=attn_len),
                           donate_argnames=("cache",))
            # donation: rebuild cache each call; time by dispatching a few
            # sequential loops (each ~STEPS*ms, dispatch overhead <<)
            out, cache, _ = loop(params=params, tokens=toks, cache=cache,
                                 active=active)
            sync(out)
            out, cache, _ = loop(params=params, tokens=toks, cache=cache,
                                 active=active)
            sync(out)
            t0 = time.time()
            reps = 4
            for _ in range(reps):
                out, cache, _ = loop(params=params, tokens=toks,
                                     cache=cache, active=active)
            sync(out)
            step_ms = (time.time() - t0) / reps / STEPS * 1e3
            floor_ms = wbytes / 614e9 * 1e3
            print(f"b={b:4d} attn_len={attn_len}: {step_ms:6.2f} ms/step "
                  f"({b/step_ms*1e3:7.0f} tok/s, weight floor "
                  f"{floor_ms:.2f} ms = {floor_ms/step_ms*100:.0f}%)",
                  flush=True)
            del cache

    # isolated pieces at b=64
    from flash_attention_softmax_n_tpu.models.decoder import _mm
    b = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.d_model),
                          jnp.bfloat16)
    pieces = [
        ("qkv (2048->3072)", (cfg.d_model, 3072)),
        ("o   (2048->2048)", (cfg.d_model, cfg.d_model)),
        ("w_gu(2048->11264)", (cfg.d_model, 2 * cfg.d_ff)),
        ("down(5632->2048)", (cfg.d_ff, cfg.d_model)),
    ]
    total = 0.0
    for name, (kin, nout) in pieces:
        from flash_attention_softmax_n_tpu.quant.qtensor import quantize
        w = quantize(jax.random.normal(jax.random.PRNGKey(2), (kin, nout),
                                       jnp.bfloat16), bits=8, axis=0)
        xi = x if kin == cfg.d_model else jax.random.normal(
            jax.random.PRNGKey(3), (b, kin), jnp.bfloat16)

        def f(xi, w=w):
            out = _mm(xi, w, int8_mm_impl="xla")
            # fold N back to the input width so the scan can chain
            pad = -out.shape[-1] % xi.shape[-1]
            out = jnp.pad(out, ((0, 0), (0, pad)))
            return out.reshape(xi.shape[0], -1, xi.shape[-1]).sum(1)

        try:
            dt = time_scan(jax.jit(f), xi, reps=50, outer=3)
        except Exception as e:
            print(f"  {name}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        sol = kin * nout / 614e9
        per_layer = dt * 1e6
        total += dt * cfg.n_layers
        print(f"  {name}: {per_layer:7.1f} us ({sol*1e6:6.1f} us SOL, "
              f"{sol/dt*100:3.0f}%)", flush=True)
    print(f"  matmul stack x{cfg.n_layers} layers: {total*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
