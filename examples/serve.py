"""Serve a softmax-1 decoder with the quantized continuous-batching engine.

Mirrors the reference's end-user story (attention with softmax-N) extended
to the north-star serving stack: INT8 weight-only + INT8 KV cache, slot
admission, fused multi-step decode. Runs on one TPU chip, or on CPU for a
smoke test (python examples/serve.py --cpu).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quant", default="int8", choices=["none", "int8", "fp8"])
    ap.add_argument("--loop-steps", type=int, default=16,
                    help="fused decode chunk between scheduling points; "
                         "0 = per-step decoding")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flash_attention_softmax_n_tpu.engine import InferenceEngine
    from flash_attention_softmax_n_tpu.models import (
        DecoderConfig,
        init_decoder_params,
    )
    from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights

    on_tpu = jax.default_backend() == "tpu"
    cfg = DecoderConfig(
        vocab_size=32000, d_model=2048 if on_tpu else 256,
        n_layers=22 if on_tpu else 2, n_heads=32 if on_tpu else 8,
        n_kv_heads=4, d_ff=5632 if on_tpu else 512,
        max_seq_len=2048 if on_tpu else 128,
        softmax_n=1.0, dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    print(f"init {cfg.n_layers}-layer softmax-{cfg.softmax_n:g} decoder "
          f"on {jax.default_backend()}")
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    if args.quant != "none":
        params = quantize_decoder_weights(params, bits=8)

    eng = InferenceEngine(
        cfg, params, max_batch=args.batch, max_len=cfg.max_seq_len,
        kv_quantization=None if args.quant == "none" else args.quant)

    rng = jax.random.PRNGKey(1)
    for i in range(args.batch * 2):  # oversubscribe: exercises re-admission
        rng, k1, k2 = jax.random.split(rng, 3)
        n = int(jax.random.randint(k1, (), 4, 48))
        prompt = jax.random.randint(k2, (n,), 0, cfg.vocab_size).tolist()
        eng.submit(prompt, max_new_tokens=32)

    t0 = time.time()
    finished = eng.run_until_done(
        loop_steps=args.loop_steps or None)
    dt = time.time() - t0
    total = sum(len(r.output) for r in finished)
    print(f"served {len(finished)} requests, {total} tokens "
          f"in {dt:.2f}s -> {total/dt:.0f} tok/s")
    for r in finished[:3]:
        print(f"  req {r.request_id}: {r.output[:8]}...")


if __name__ == "__main__":
    main()
