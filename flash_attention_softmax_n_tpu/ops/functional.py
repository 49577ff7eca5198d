"""Core softmax-N primitives and the unfused reference attention (the oracle).

TPU-native re-design of the reference library's ``core/functional.py``
(reference: flash_attention_softmax_n/core/functional.py:15-93). Everything in
this module is pure ``jax.numpy`` — fully jittable, differentiable through
``jax.grad``, and used as the correctness oracle for the fused Pallas kernels.

Softmax-N::

    softmax_n(x_i) = exp(x_i) / (n + sum_j exp(x_j))

Key subtlety (reference functional.py:19-28): softmax-N is *not*
shift-invariant for n != 0, so after subtracting the (detached) max for
numerical stability, the denominator must carry a compensating
``n * exp(-shift)`` term.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["softmax_n", "slow_attention_n"]


def softmax_n(
    x: jax.Array,
    n: Optional[float] = None,
    axis: int = -1,
    dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Numerically-stable generalized softmax with ``+n`` in the denominator.

    ``softmax_n(x)_i = exp(x_i) / (n + sum_j exp(x_j))`` along ``axis``.

    Args:
      x: input logits.
      n: the softmax-N regularizer; ``None`` means 0 (standard softmax).
      axis: reduction axis (reference calls this ``dim``).
      dtype: optional output dtype cast applied after the softmax.

    The max-shift is detached (``stop_gradient``) to match the reference
    semantics (functional.py:26); the gradient flows through the
    numerator/denominator only.
    """
    if n is None:
        n = 0.0
    shift = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    if n:
        # clamp the shift at 0 (the phantom key scores 0 — the same
        # m0 = 0 the fused kernel uses): exp(-shift) stays <= 1, so the
        # n-term can never overflow when every real score is very
        # negative (rowmax < -88.7 would make f32 exp(-shift) inf).
        shift = jnp.maximum(shift, 0.0)
    numerator = jnp.exp(x - shift)
    denominator = jnp.sum(numerator, axis=axis, keepdims=True)
    if n:
        # the n == 0 branch must NOT build this term: 0 * exp(-shift)
        # is 0 * inf = NaN once rowmax < -88.7 (f32 exp overflow) —
        # observed for real at 181M scale, where the n=0 run's layer-1
        # self-scores reach -92 by step 6000 and the single-valid-key
        # decode row went NaN (round 5; softmax-0 is shift-invariant, so
        # dropping the term is exact).
        denominator = denominator + n * jnp.exp(-shift)
    out = numerator / denominator
    return out if dtype is None else out.astype(dtype)


def slow_attention_n(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    is_causal: bool = False,
    scale: Optional[float] = None,
    softmax_n_param: Optional[float] = None,
    softmax_dtype: Optional[jnp.dtype] = None,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Unfused scaled-dot-product attention with softmax-N — the oracle.

    Mirrors the reference ``slow_attention_n`` contract
    (reference: core/functional.py:32-93):

    * query ``(N, ..., L, E)``, key ``(N, ..., S, E)``, value
      ``(N, ..., S, Ev)`` — ndim >= 2, L may differ from S, Ev may differ
      from E.
    * ``attn_mask``: boolean mask (True = attend) of shape broadcastable to
      ``(..., L, S)``, or a float additive bias.
    * ``is_causal``: rectangular causal mask ``tril(diagonal=S-L)`` —
      mutually exclusive with ``attn_mask``.
    * ``scale``: defaults to ``1/sqrt(E)``.
    * ``softmax_dtype``: dtype used for the softmax output (defaults to
      query dtype).
    * dropout is applied to the attention weights when ``train`` and
      ``dropout_p > 0`` (requires ``dropout_rng``).
    """
    if softmax_n_param is None:
        softmax_n_param = 0.0
    if softmax_dtype is None:
        softmax_dtype = query.dtype

    L, S = query.shape[-2], key.shape[-2]
    E = query.shape[-1]
    scale_factor = (1.0 / math.sqrt(E)) if scale is None else scale

    attn_bias = jnp.zeros((L, S), dtype=query.dtype)
    if is_causal:
        if attn_mask is not None:
            raise ValueError("attn_mask and is_causal are mutually exclusive")
        causal = jnp.tril(jnp.ones((L, S), dtype=bool), k=S - L)
        attn_bias = jnp.where(causal, attn_bias, -jnp.inf)

    attn_weight = (
        jnp.einsum("...le,...se->...ls", query, key) * jnp.asarray(scale_factor, query.dtype)
    )
    attn_weight = attn_weight + attn_bias
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            attn_weight = jnp.where(attn_mask, attn_weight, -jnp.inf)
        else:
            attn_weight = attn_weight + attn_mask

    attn_weight = softmax_n(attn_weight, n=softmax_n_param, axis=-1, dtype=softmax_dtype)

    if dropout_p > 0.0 and train:
        if dropout_rng is None:
            raise ValueError("dropout_p > 0 with train=True requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, attn_weight.shape)
        attn_weight = jnp.where(keep, attn_weight / (1.0 - dropout_p), 0.0).astype(
            attn_weight.dtype
        )

    return jnp.einsum("...ls,...sv->...lv", attn_weight, value.astype(attn_weight.dtype))
