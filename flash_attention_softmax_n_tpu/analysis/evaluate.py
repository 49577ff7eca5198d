"""Perplexity evaluation: the quantization-quality instrument.

BASELINE.json's metric triplet ends with "Δppl vs fp16": quantization must
hold modeling quality, not just throughput. The reference has no eval
harness (its analysis subpackage measures activation moments, hooks.py) —
this closes that gap the TPU way: a jittable token-level negative
log-likelihood, batched over padded sequences, plus a one-call
``delta_perplexity`` that scores a quantized parameter pytree against its
dense reference on the same token stream.

Softmax-N note: evaluation runs the model exactly as configured
(cfg.softmax_n flows into the attention kernels), so surgery'd softmax-1
checkpoints are scored with softmax-1 attention — the end-to-end check
that surgery + quantization preserved the model.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
)

__all__ = ["token_nll", "perplexity", "delta_perplexity"]


def token_nll(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
              mask: Optional[jax.Array] = None
              ) -> Tuple[jax.Array, jax.Array]:
    """Summed next-token negative log-likelihood over a (B, L) batch.

    ``mask`` (B, L) bool marks VALID tokens (padding excluded); the loss for
    position i predicts token i+1, so the last position never contributes.
    Returns (total_nll (f32 scalar), token_count (int32 scalar)) — summable
    across batches for corpus-level perplexity.
    """
    logits = decoder_forward(params, cfg, tokens).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is None:
        valid = jnp.ones_like(targets, dtype=bool)
    else:
        valid = jnp.logical_and(mask[:, :-1], mask[:, 1:])
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll), jnp.sum(valid.astype(jnp.int32))


def perplexity(params: Dict, cfg: DecoderConfig, token_batches,
               mask_batches=None) -> float:
    """Corpus perplexity over an iterable of (B, L) token arrays."""
    import itertools

    step = jax.jit(partial(token_nll, cfg=cfg))
    total, count = 0.0, 0
    if mask_batches is None:
        mask_batches = itertools.repeat(None)
    for tokens, mask in zip(token_batches, mask_batches):
        nll, n = step(params, tokens=jnp.asarray(tokens),
                      mask=None if mask is None else jnp.asarray(mask))
        total += float(nll)
        count += int(n)
    if count == 0:
        raise ValueError("no valid tokens to evaluate")
    return float(jnp.exp(total / count))


def delta_perplexity(dense_params: Dict, quant_params: Dict,
                     cfg: DecoderConfig, token_batches) -> Dict[str, float]:
    """Δppl of a quantized pytree vs its dense reference on the same tokens.

    Returns {'ppl_dense', 'ppl_quant', 'delta', 'relative'} — the number the
    north star bounds ("hold perplexity within the quantized model's stated
    Δ at the same bit-width").
    """
    batches = [jnp.asarray(b) for b in token_batches]
    ppl_dense = perplexity(dense_params, cfg, batches)
    ppl_quant = perplexity(quant_params, cfg, batches)
    return {
        "ppl_dense": ppl_dense,
        "ppl_quant": ppl_quant,
        "delta": ppl_quant - ppl_dense,
        "relative": (ppl_quant - ppl_dense) / ppl_dense,
    }
