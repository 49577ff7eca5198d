"""Non-toy softmax-N quantization study (VERDICT r4 item 6).

Trains a ~180M-param Llama-style byte-level decoder (d_model 1024, 16
layers, GQA 16/4, SwiGLU, RoPE — the serving architecture) on a real code
corpus (~64 MB of Python/Markdown source harvested offline from this image's
site-packages), then measures the reference's ENTIRE scientific claim
("softmax-N suppresses activation outliers -> quantizes better",
reference README.md:4) at a scale where outliers exist:

  * held-out perplexity: dense bf16, int8-W, int4-W (full forward), and
    int8-W + int8-KV through the CACHED decode path (the serving config);
  * per-layer activation kurtosis via the analysis subsystem's jitted taps
    (analysis/hooks.py), fed to quant/gates.py's bit-width gates;
  * weight kurtosis per parameter.

Run once per softmax_n (the n=0 baseline and the n=1 treatment):

    nohup python scripts/train_quant_study.py --softmax-n 1 &
    ...then --softmax-n 0

Mixed precision: f32 master params, bf16 compute (params cast inside the
loss; cast-gradients flow back to f32). Checkpoints every --ckpt-every
steps under results/quant_study/n{N}/ (resumable with --resume after a
relay wedge). Writes artifacts/quant_study_n{N}.json.
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
from flash_attention_softmax_n_tpu.analysis.hooks import (
    activation_stats_to_dict,
    compute_weight_statistics,
    init_activation_stats,
    update_activation_stats,
)
from flash_attention_softmax_n_tpu.models.decoder import (
    DecoderConfig,
    decode_step,
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
)
from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
from flash_attention_softmax_n_tpu.quant.gates import gate_report
from flash_attention_softmax_n_tpu.utils.checkpoint import (
    load_train_checkpoint,
    save_train_checkpoint,
)

CORPUS_DIRS = [
    "/opt/venv/lib/python3.12/site-packages",  # the live venv (~GBs of .py)
    "/usr/lib/python3.12",
    str(REPO),
]


def iter_corpus_files():
    """Deterministic corpus file stream: sorted .py/.md under CORPUS_DIRS.

    Factored out (round 5) so the v2 eval can replay the exact train-file
    walk and take files BEYOND the budget cutoff as a genuinely unseen
    same-distribution eval (scripts/eval_quant_study_v2.py)."""
    for root in CORPUS_DIRS:
        rootp = pathlib.Path(root)
        if not rootp.exists():
            continue
        for pat in ("**/*.py", "**/*.md"):
            for f in sorted(rootp.glob(pat)):
                if ".git" in f.parts or "results" in f.parts:
                    continue
                try:
                    b = f.read_bytes()
                except OSError:
                    continue
                if len(b) < 256:
                    continue
                yield f, b


def load_corpus(max_mb: int) -> np.ndarray:
    """Deterministic byte corpus: the file stream up to a byte budget."""
    parts, total = [], 0
    budget = max_mb * 1024 * 1024
    for _, b in iter_corpus_files():
        parts.append(b)
        total += len(b)
        if total >= budget:
            break
    data = b"\n\n".join(parts)[:budget]
    return np.frombuffer(data, np.uint8).astype(np.int32)


def cast_bf16(params):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)


def cached_decode_ppl(params, cfg, token_batches, quantization):
    """Teacher-forced perplexity through the cached decode path, with the
    per-token loop as one on-device lax.scan (the toy script's host loop
    costs a relay dispatch per token; at seq 512 that is the measurement).
    Token t enters decode_step (appending its k/v to the cache exactly as
    the serving engine does) and its logits score token t+1."""
    seq = token_batches[0].shape[1]

    @jax.jit
    def run(params, tokens):
        cache = init_kv_cache(cfg, tokens.shape[0], max_len=seq,
                              quantization=quantization)

        def step(cache, tok):
            logits, cache = decode_step(params, cfg, tok, cache)
            return cache, jax.nn.log_softmax(
                logits.astype(jnp.float32), -1)

        _, logps = jax.lax.scan(step, cache, tokens.T[:-1])  # (T-1, B, V)
        tgt = tokens.T[1:]  # (T-1, B)
        nll = -jnp.take_along_axis(logps, tgt[..., None], axis=-1)
        return jnp.sum(nll), tgt.size

    total, count = 0.0, 0
    for tokens in token_batches:
        s, n = run(params, jnp.asarray(tokens))
        total += float(s)
        count += int(n)
    return float(np.exp(total / count))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--softmax-n", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--d-ff", type=int, default=2816)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--corpus-mb", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate the checkpoint as-is")
    ap.add_argument("--deadline-s", type=float, default=0.0,
                    help="stop training (checkpoint + eval) after this "
                    "many seconds; 0 = no deadline")
    ap.add_argument("--stop-step", type=int, default=0,
                    help="stop training at this absolute step (the lr "
                    "schedule still spans --steps) — used to train the "
                    "n=0 control to the same step the n=1 run reached")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke tests / relay wedges)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os as _cache_os
    _cd = _cache_os.path.join(_cache_os.path.dirname(_cache_os.path.dirname(_cache_os.path.abspath(__file__))), 'results', 'jitcache')
    _cache_os.makedirs(_cd, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cd)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

    ntag = f"n{args.softmax_n:g}".replace(".", "p")
    ckpt_dir = REPO / "results" / "quant_study" / ntag
    t_start = time.time()

    data = load_corpus(args.corpus_mb)
    split = int(len(data) * 0.98)
    train, held = data[:split], data[split:]
    print(f"corpus: {len(data)/1e6:.1f} MB ({split} train / "
          f"{len(held)} eval bytes)", file=sys.stderr, flush=True)

    cfg = DecoderConfig(
        vocab_size=256, d_model=args.d_model, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, d_ff=args.d_ff,
        max_seq_len=args.seq, softmax_n=args.softmax_n, dtype=jnp.bfloat16,
        remat=True)  # layer-scan residuals at d_ff 2816 x b32 are 18 GB
        #              without remat (measured OOM) — recompute instead
    cfg_init = DecoderConfig(**{**cfg.__dict__, "dtype": jnp.float32})

    warmup = min(500, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps,
        end_value=args.lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))

    step0 = 0
    if (args.resume or args.eval_only) and (ckpt_dir / "opt_state.json"
                                            ).exists():
        _, params, opt_state, step0, _ = load_train_checkpoint(
            str(ckpt_dir), opt)
        print(f"resumed from step {step0}", file=sys.stderr, flush=True)
    else:
        params = init_decoder_params(cfg_init, jax.random.PRNGKey(args.seed))
        opt_state = opt.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f}M params, softmax_n={cfg.softmax_n}",
          file=sys.stderr, flush=True)

    @jax.jit
    def train_step(params, opt_state, tokens):
        def loss_fn(p):
            logits = decoder_forward(cast_bf16(p), cfg, tokens).astype(
                jnp.float32)
            logp = jax.nn.log_softmax(logits[:, :-1], -1)
            tgt = tokens[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], -1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed + step0)  # fresh stream on resume
    hi = len(train) - args.seq - 1
    tok_per_step = args.batch * args.seq
    t0 = time.time()
    i = step0
    if args.stop_step and step0 >= args.stop_step:
        # resuming at/past the stop step: do NOT train one extra step and
        # overwrite the checkpoint (ADVICE r4) — go straight to eval
        print(f"step0 {step0} >= stop-step {args.stop_step} — skipping "
              f"training, evaluating checkpoint as-is",
              file=sys.stderr, flush=True)
    elif not args.eval_only:
        for i in range(step0, args.steps):
            idx = rng.randint(0, hi, size=args.batch)
            toks = jnp.asarray(
                np.stack([train[j:j + args.seq] for j in idx]))
            params, opt_state, loss = train_step(params, opt_state, toks)
            if i % 100 == 0 or i == args.steps - 1:
                print(f"step {i:6d} loss {float(loss):.4f} "
                      f"({time.time() - t0:.0f}s, "
                      f"{(i - step0 + 1) * tok_per_step / 1e6:.0f}M tok)",
                      file=sys.stderr, flush=True)
            hit_deadline = bool(
                (args.deadline_s
                 and time.time() - t_start > args.deadline_s)
                or (args.stop_step and i + 1 >= args.stop_step))
            if ((i + 1) % args.ckpt_every == 0 or i == args.steps - 1
                    or hit_deadline):
                save_train_checkpoint(str(ckpt_dir), cfg_init, params,
                                      opt_state, step=i + 1)
                print(f"checkpointed at step {i + 1}", file=sys.stderr,
                      flush=True)
            if hit_deadline:
                why = ("stop-step reached"
                       if args.stop_step and i + 1 >= args.stop_step
                       else "deadline hit")
                print(f"{why} — evaluating current checkpoint",
                      file=sys.stderr, flush=True)
                break

    # ---- evaluation ----
    results = {"config": {
        "d_model": cfg.d_model, "n_layers": cfg.n_layers,
        "n_heads": cfg.n_heads, "n_kv_heads": cfg.n_kv_heads,
        "d_ff": cfg.d_ff, "softmax_n": cfg.softmax_n, "seq": args.seq,
        "params_m": round(n_params / 1e6, 1),
        "train_steps": int(i + 1 if not args.eval_only else step0),
        "train_tokens_m": round(
            (i + 1 if not args.eval_only else step0)
            * tok_per_step / 1e6, 1),
        "corpus_bytes": int(len(data)),
        "backend": jax.default_backend()}}

    # deterministic disjoint held-out windows
    n_ev = 8
    stride = (len(held) - args.seq - 1) // (n_ev * args.batch)
    ev = [np.stack([held[(b * args.batch + j) * stride:][:args.seq]
                    for j in range(args.batch)]) for b in range(n_ev)]

    p_bf = cast_bf16(params)
    ppl_dense = perplexity(p_bf, cfg, ev)
    results["ppl_dense_bf16"] = ppl_dense
    print(f"dense bf16: ppl {ppl_dense:.4f}", file=sys.stderr, flush=True)
    for bits in (8, 4):
        qp = quantize_decoder_weights(p_bf, bits=bits)
        p = perplexity(qp, cfg, ev)
        results[f"ppl_int{bits}_w"] = p
        results[f"delta_int{bits}_w"] = p - ppl_dense
        print(f"int{bits} weight-only: ppl {p:.4f} "
              f"(D {p - ppl_dense:+.4f})", file=sys.stderr, flush=True)

    dec_ev = ev[:2]
    qp8 = quantize_decoder_weights(p_bf, bits=8)
    ppl_dec_dense = cached_decode_ppl(p_bf, cfg, dec_ev, None)
    ppl_dec_q = cached_decode_ppl(qp8, cfg, dec_ev, "int8")
    results["ppl_decode_dense"] = ppl_dec_dense
    results["ppl_decode_int8w_int8kv"] = ppl_dec_q
    results["delta_int8w_int8kv"] = ppl_dec_q - ppl_dec_dense
    print(f"decode path: dense {ppl_dec_dense:.4f} vs int8W+int8KV "
          f"{ppl_dec_q:.4f} (D {ppl_dec_q - ppl_dec_dense:+.4f})",
          file=sys.stderr, flush=True)

    # activation kurtosis through the analysis taps (the subsystem built
    # to gate bit-widths — SURVEY C9/C10), over the held-out batches
    tap_names = [f"layers.{i}.attention.output"
                 for i in range(cfg.n_layers)]
    stats = init_activation_stats(tap_names)

    # params MUST be an argument, not a closure: a closed-over 180M-param
    # tree is baked into the jaxpr as ~360MB of constants, and the relay's
    # remote-compile endpoint rejects the request body (HTTP 413).
    @jax.jit
    def stat_step(params, stats, tokens):
        _, taps = decoder_forward(params, cfg, tokens, collect_taps=True)
        return update_activation_stats(stats, taps)

    for tokens in ev:
        stats = stat_step(p_bf, stats, jnp.asarray(tokens))
    act = activation_stats_to_dict(stats)
    results["activation_stats"] = act
    results["gate_report"] = gate_report(act, target="activations")
    kurts = [act[n]["kurtosis"] for n in tap_names]
    results["kurtosis_summary"] = {
        "max": max(kurts), "mean": sum(kurts) / len(kurts)}
    print(f"activation kurtosis: max {max(kurts):.2f}, "
          f"mean {sum(kurts)/len(kurts):.2f}", file=sys.stderr, flush=True)

    wstats = compute_weight_statistics(params)
    results["weight_kurtosis_max"] = max(
        v["kurtosis"] for v in wstats.values())
    # gate only the matmul weights: norm gains / embeddings stay
    # unquantized (quantize_decoder_weights leaves them dense), so their
    # kurtosis is not a quantization decision input
    results["weight_gate_report"] = gate_report(
        {k: v for k, v in wstats.items()
         if "norm" not in k and "embed" not in k}, target="weights")
    results["weight_stats"] = {k: v for k, v in wstats.items()
                               if "layers" not in k or "/0/" in k}

    out = REPO / "artifacts" / f"quant_study_{ntag}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, dict)}), flush=True)


if __name__ == "__main__":
    main()
