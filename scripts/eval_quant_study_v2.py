"""Quant-study v2 eval: non-saturated held-out corpora (VERDICT r4 item 2a).

Round 4's eval was the alphabetical TAIL of the sorted train concatenation
— near-duplicate of train and saturated at 1.12 ppl/byte (~0.16 bits/byte),
an entropy floor at which quantization deltas cannot discriminate anything.
This script re-evaluates BOTH trained checkpoints (results/quant_study/
n{0,1}, 181M params, 31M train tokens) on three evals:

  tail        the round-4 holdout (kept for continuity/comparison)
  unseen_py   .py/.md files from the SAME deterministic corpus walk but
              BEYOND the 64 MB train budget cutoff — same distribution,
              never seen by training; exact-content dedup vs every train
              file (site-packages ships duplicate files)
  cpp         torch/include C++ headers — a corpus the byte LM never saw
              in any form (transfer eval; different language entirely)

For each eval x quant config: ppl/byte AND bits/byte (the honest unit —
VERDICT r4 item 2a). Quant configs: dense bf16, int8-W, int4-W (full
forward), dense vs int8-W + int8-KV through the cached decode path.

Usage: timeout 3600 python scripts/eval_quant_study_v2.py
Writes artifacts/quant_study_v2.json.
"""

from __future__ import annotations

import hashlib
import json
import math
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_softmax_n_tpu.analysis.evaluate import perplexity
from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
from flash_attention_softmax_n_tpu.utils.checkpoint import load_checkpoint
from scripts.train_quant_study import (
    cached_decode_ppl,
    cast_bf16,
    iter_corpus_files,
    load_corpus,
)

TRAIN_MB = 64      # must match the round-4 training runs
EVAL_MB = 6        # per-eval corpus size
SEQ, BATCH = 512, 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpora():
    """(tail, unseen_py, cpp) int32 byte arrays; unseen_py is dedup'd
    against every train-walk file by content hash."""
    budget = TRAIN_MB * 1024 * 1024
    seen_hashes = set()
    total = 0
    stream = iter_corpus_files()
    for _, b in stream:
        seen_hashes.add(hashlib.sha1(b).hexdigest())
        total += len(b)
        if total >= budget:
            break
    # round-4 tail eval: last 2% of the truncated train concatenation
    data = load_corpus(TRAIN_MB)
    tail = data[int(len(data) * 0.98):]

    ev_budget = EVAL_MB * 1024 * 1024
    parts, got, dropped = [], 0, 0
    for _, b in stream:  # continues exactly where the train walk stopped
        hx = hashlib.sha1(b).hexdigest()
        if hx in seen_hashes:
            dropped += 1
            continue
        seen_hashes.add(hx)  # also dedup within the eval itself
        parts.append(b)
        got += len(b)
        if got >= ev_budget:
            break
    unseen = np.frombuffer(b"\n\n".join(parts)[:ev_budget],
                           np.uint8).astype(np.int32)
    log(f"unseen_py: {got/1e6:.1f} MB from {len(parts)} files "
        f"({dropped} exact-duplicate files dropped)")

    inc = pathlib.Path("/opt/venv/lib/python3.12/site-packages/torch/include")
    cparts, cgot = [], 0
    for f in sorted(inc.glob("**/*")):
        if f.suffix not in (".h", ".hpp", ".cuh", ".hh"):
            continue
        try:
            b = f.read_bytes()
        except OSError:
            continue
        if len(b) < 256:
            continue
        cparts.append(b)
        cgot += len(b)
        if cgot >= ev_budget:
            break
    cpp = np.frombuffer(b"\n\n".join(cparts)[:ev_budget],
                        np.uint8).astype(np.int32)
    log(f"cpp: {cgot/1e6:.1f} MB from {len(cparts)} torch/include headers")
    return {"tail": tail, "unseen_py": unseen, "cpp": cpp}


def batches(arr, n_batches):
    stride = (len(arr) - SEQ - 1) // (n_batches * BATCH)
    return [np.stack([arr[(b * BATCH + j) * stride:][:SEQ]
                      for j in range(BATCH)]) for b in range(n_batches)]


def bits(ppl):
    return round(math.log2(ppl), 4)


def main():
    log(f"backend: {jax.default_backend()}")
    cache = REPO / "results" / "jitcache"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    corpora = build_corpora()
    path = REPO / "artifacts" / "quant_study_v2.json"
    # resumable across relay flaps: reload prior partial results and skip
    # any (checkpoint, corpus) cell that already has numbers
    out = {"eval_mb": EVAL_MB, "seq": SEQ, "batch": BATCH,
           "backend": jax.default_backend()}
    if path.exists():
        try:
            out.update(json.loads(path.read_text()))
            log(f"resuming over existing {path}")
        except ValueError:
            pass

    for ntag in ("n0", "n1"):
        ckpt = REPO / "results" / "quant_study" / ntag
        if not (ckpt / "params.npz").exists():
            log(f"SKIP {ntag}: no checkpoint at {ckpt}")
            continue
        cfg, params, meta = load_checkpoint(str(ckpt))
        step = meta.get("train_step", 0)
        log(f"{ntag}: loaded step-{step} checkpoint "
            f"(softmax_n={cfg.softmax_n})")
        p_bf = cast_bf16(params)
        qp8 = quantize_decoder_weights(p_bf, bits=8)
        qp4 = quantize_decoder_weights(p_bf, bits=4)
        res = out.get(ntag, {})
        res["train_steps"] = int(step)
        for cname, arr in corpora.items():
            if res.get(cname, {}).get("delta_w8a8") is not None:
                log(f"{ntag}/{cname}: already evaluated, skipping")
                continue
            t0 = time.time()
            ev = batches(arr, 8)
            row = {}
            dense = perplexity(p_bf, cfg, ev)
            row["ppl_dense"] = dense
            row["bpb_dense"] = bits(dense)
            for label, qp in (("int8_w", qp8), ("int4_w", qp4)):
                p = perplexity(qp, cfg, ev)
                row[f"ppl_{label}"] = p
                row[f"bpb_{label}"] = bits(p)
                row[f"delta_{label}"] = p - dense
            # W8A8 — ACTIVATION quantization (per-row absmax int8 on the
            # Pallas int8-MXU path), the regime the reference's outlier
            # claim is actually about: if softmax-1's kurtosis halving
            # buys anything, it should show here, not in weight-only
            import dataclasses as _dc
            cfg_a8 = _dc.replace(cfg, act_bits=8)
            p = perplexity(qp8, cfg_a8, ev)
            row["ppl_w8a8"] = p
            row["bpb_w8a8"] = bits(p)
            row["delta_w8a8"] = p - dense
            dd = cached_decode_ppl(p_bf, cfg, ev[:2], None)
            dq = cached_decode_ppl(qp8, cfg, ev[:2], "int8")
            row["ppl_decode_dense"] = dd
            row["ppl_decode_int8w_int8kv"] = dq
            row["delta_int8w_int8kv"] = dq - dd
            res[cname] = row
            out[ntag] = res
            path.write_text(json.dumps(out, indent=2))  # flap checkpoint
            log(f"{ntag}/{cname}: dense {dense:.4f} ppl/byte "
                f"({bits(dense):.3f} bpb), int8W Δ{row['delta_int8_w']:+.5f},"
                f" int4W Δ{row['delta_int4_w']:+.5f}, "
                f"W8A8 Δ{row['delta_w8a8']:+.5f}, decode int8W+KV "
                f"Δ{row['delta_int8w_int8kv']:+.5f}  [{time.time()-t0:.0f}s]")
        out[ntag] = res
        for leaf in jax.tree.leaves((params, p_bf, qp8, qp4)):
            leaf.delete()

    path.write_text(json.dumps(out, indent=2))
    log(f"wrote {path}")
    print(json.dumps({k: v for k, v in out.items() if k in ("n0", "n1")},
                     default=float)[:2000], flush=True)


if __name__ == "__main__":
    main()
