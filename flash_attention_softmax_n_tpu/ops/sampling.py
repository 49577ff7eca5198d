"""Token sampling: per-slot temperature, top-k, and top-p (nucleus).

Serving-engine sampling as ONE jittable function over a batch of logits
rows, designed so a continuous-batching engine never has to leave its fused
decode loop for mixed sampling settings (north-star serving capability; the
reference has no sampling layer at all):

  * everything per-slot is DATA, not structure — temperatures, k, and p are
    (B,) arrays, so one compiled executable covers any mixture of greedy /
    temperature / top-k / nucleus slots, and requests with different
    settings batch together;
  * the filtered path sorts once and applies both truncations on the
    sorted row (HF ``top_k_top_p_filtering`` semantics: temperature first,
    then top-k, then top-p on the scaled distribution);
  * rows with temperature 0 take the argmax regardless of k/p (greedy is
    the k=1 fixed point anyway).

The unfiltered path (no k/p anywhere in the batch) skips the sort — at
vocab 32000 the descending sort is the dominant cost, so the engine keys
its compiled loop on "does anything need filtering" (a host-known bit per
scheduling window) rather than paying it always.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sample_tokens"]


def sample_tokens(
    logits: jax.Array,
    rng: jax.Array,
    temps: jax.Array,
    top_k: Optional[jax.Array] = None,
    top_p: Optional[jax.Array] = None,
) -> jax.Array:
    """Sample one token per row of ``logits``.

    logits: (B, V) float; temps: (B,) — 0 selects greedy argmax for that
    row; top_k: (B,) int32, <= 0 disables k-truncation for that row;
    top_p: (B,) float, >= 1 disables nucleus truncation. Pass ``None`` for
    top_k/top_p to compile the sort-free fast path.

    Returns (B,) int32 token ids.
    """
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temps = jnp.asarray(temps, jnp.float32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]

    if top_k is None and top_p is None:
        sampled = jax.random.categorical(rng, scaled, axis=-1)
        return jnp.where(temps > 0, sampled.astype(jnp.int32), greedy_tok)

    # one descending sort serves both truncations; top-k applies FIRST and
    # top-p measures mass on the k-truncated (renormalized) distribution —
    # HF top_k_top_p_filtering composes its warpers in that order
    sort_idx = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    pos = jnp.arange(v, dtype=jnp.int32)[None, :]

    keep = jnp.ones(scaled.shape, bool)
    if top_k is not None:
        k = jnp.asarray(top_k, jnp.int32)
        k = jnp.where(k <= 0, v, k)[:, None]
        keep &= pos < k
    if top_p is not None:
        p = jnp.asarray(top_p, jnp.float32)[:, None]
        after_k = jnp.where(keep, sorted_logits, -jnp.inf)
        probs = jax.nn.softmax(after_k, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix whose mass reaches p: token j survives
        # iff the mass strictly before it is < p (j=0 always survives)
        keep &= (cum - probs) < p
    keep = keep.at[:, 0].set(True)

    masked = jnp.where(keep, sorted_logits, -jnp.inf)
    choice = jax.random.categorical(rng, masked, axis=-1)
    sampled = jnp.take_along_axis(
        sort_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy_tok)
