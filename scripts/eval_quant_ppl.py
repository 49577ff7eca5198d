"""Δppl artifact: quantization quality on a REAL trained checkpoint.

BASELINE.md's metric triplet ends with "Δppl vs fp16"; until round 3 the
only Δppl numbers came from random-init tiny models (tests/test_quant.py),
which say nothing about quality on a model with actual structure. No
network access means no public checkpoints, so this script makes its own:

  1. corpus: every .py/.md file in this repo, byte-level (vocab 256) —
     ~1.5 MB of real, structured text available offline;
  2. train a small softmax-1 Llama-style decoder (surgery target shape:
     GQA, SwiGLU, RoPE) to convergence-enough on CPU or TPU;
  3. score held-out perplexity: bf16/f32 dense, int8 weight-only, int4
     weight-only (full forward), and int8-W + int8-KV via the CACHED
     decode path (teacher-forced decode_step loop — the configuration the
     serving engine actually runs, scored against the same loop with a
     dense cache so the KV-quantization effect is isolated);
  4. write results/quant_ppl.json.

Usage:  python scripts/eval_quant_ppl.py [--steps 700] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_attention_softmax_n_tpu.analysis.evaluate import perplexity
from flash_attention_softmax_n_tpu.models.decoder import (
    DecoderConfig,
    decode_step,
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
)
from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights

SEQ = 192
BATCH = 16


def load_corpus() -> np.ndarray:
    parts = []
    for pat in ("**/*.py", "**/*.md"):
        for f in sorted(REPO.glob(pat)):
            if ".git" in f.parts or "results" in f.parts:
                continue
            try:
                parts.append(f.read_bytes())
            except OSError:
                pass
    data = b"\n\n".join(parts)
    return np.frombuffer(data, np.uint8).astype(np.int32)


def batches(data: np.ndarray, rng: np.random.RandomState, n: int):
    hi = len(data) - SEQ - 1
    for _ in range(n):
        idx = rng.randint(0, hi, size=BATCH)
        yield np.stack([data[i:i + SEQ] for i in idx])


def eval_batches(data: np.ndarray, n: int):
    # deterministic, disjoint windows over the held-out tail
    step = (len(data) - SEQ - 1) // (n * BATCH)
    out = []
    for b in range(n):
        idx = [(b * BATCH + j) * step for j in range(BATCH)]
        out.append(np.stack([data[i:i + SEQ] for i in idx]))
    return out


def cached_decode_ppl(params, cfg, token_batches, quantization):
    """Teacher-forced perplexity through the CACHED decode path.

    Token t enters decode_step (appending its k/v to the cache — dense or
    int8 — exactly as the serving engine does) and the returned logits
    score token t+1. This is the measurement BASELINE.md's "INT8 KV-cache"
    metric calls for: full-forward ppl never touches the cache.
    """
    @jax.jit
    def step(params, tok, cache):
        logits, cache = decode_step(params, cfg, tok, cache)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), cache

    total, count = 0.0, 0
    for tokens in token_batches:
        tokens = jnp.asarray(tokens)
        cache = init_kv_cache(cfg, tokens.shape[0], max_len=SEQ,
                              quantization=quantization)
        for t in range(tokens.shape[1] - 1):
            logp, cache = step(params, tokens[:, t], cache)
            tgt = tokens[:, t + 1]
            total += float(-jnp.sum(jnp.take_along_axis(
                logp, tgt[:, None], axis=-1)))
            count += int(tgt.shape[0])
    return float(np.exp(total / count))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode-eval-batches", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (e.g. while the TPU relay is wedged)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    data = load_corpus()
    split = int(len(data) * 0.95)
    train, held = data[:split], data[split:]
    print(f"corpus: {len(data)} bytes ({split} train / {len(held)} eval)",
          file=sys.stderr)

    cfg = DecoderConfig(
        vocab_size=256, d_model=192, n_layers=3, n_heads=6, n_kv_heads=2,
        d_ff=512, max_seq_len=SEQ, softmax_n=1.0, dtype=jnp.float32,
        attn_implementation="xla")
    params = init_decoder_params(cfg, jax.random.PRNGKey(args.seed))

    warmup = min(50, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-3, warmup_steps=warmup, decay_steps=args.steps)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, tokens):
        def loss_fn(p):
            logits = decoder_forward(p, cfg, tokens).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits[:, :-1], -1)
            tgt = tokens[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], -1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    for i, toks in enumerate(batches(train, rng, args.steps)):
        params, opt_state, loss = train_step(params, opt_state,
                                             jnp.asarray(toks))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i:5d} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)

    ev = eval_batches(held, 4)
    results = {"config": {"d_model": cfg.d_model, "n_layers": cfg.n_layers,
                          "softmax_n": cfg.softmax_n, "seq": SEQ,
                          "train_steps": args.steps,
                          "corpus_bytes": int(len(data)),
                          "backend": jax.default_backend()}}

    ppl_dense = perplexity(params, cfg, ev)
    results["ppl_dense_f32"] = ppl_dense
    for bits in (8, 4):
        qp = quantize_decoder_weights(params, bits=bits)
        p = perplexity(qp, cfg, ev)
        results[f"ppl_int{bits}_w"] = p
        results[f"delta_int{bits}_w"] = p - ppl_dense
        print(f"int{bits} weight-only: ppl {p:.4f} "
              f"(Δ {p - ppl_dense:+.4f})", file=sys.stderr)

    dec_ev = ev[:args.decode_eval_batches]
    qp8 = quantize_decoder_weights(params, bits=8)
    ppl_dec_dense = cached_decode_ppl(params, cfg, dec_ev, None)
    ppl_dec_q = cached_decode_ppl(qp8, cfg, dec_ev, "int8")
    results["ppl_decode_dense"] = ppl_dec_dense
    results["ppl_decode_int8w_int8kv"] = ppl_dec_q
    results["delta_int8w_int8kv"] = ppl_dec_q - ppl_dec_dense
    print(f"decode path: dense {ppl_dec_dense:.4f} vs int8W+int8KV "
          f"{ppl_dec_q:.4f} (Δ {ppl_dec_q - ppl_dec_dense:+.4f})",
          file=sys.stderr)

    out = REPO / "results" / "quant_ppl.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
