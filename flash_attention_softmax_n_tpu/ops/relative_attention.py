"""XLNet-style two-stream relative attention with softmax-N.

TPU counterpart of the reference's XLNet surgery target
(reference surgery/surgery_functions/_xlnet.py:25-75): the reference rebinds
``XLNetRelativeAttention.rel_attn_core`` on a live torch module, changing one
line — ``softmax`` -> ``softmax_n`` over axis 3. Here the whole core is a
first-party jnp function with ``n`` as an argument, numerically matching HF's
``rel_attn_core`` at n=0 (validated against the torch module in
tests/test_xlnet.py).

Semantics (XLNet / Transformer-XL):
  * content score   ac = (q + r_w_bias) . k
  * position score  bd = rel_shift((q + r_r_bias) . k_pos)
  * segment score   ef = (q + r_s_bias) . seg_embed, gathered by seg_mat
  * score = (ac + bd + ef) * scale, additive-mask scaled fp16-aware
    (-65500 for fp16, -1e30 otherwise — the same dtype-aware fill the
    reference preserves, _xlnet.py:56-59)
  * softmax_n over the key axis.

Layout follows XLNet's sequence-first convention: q/k/v are
(seq, batch, n_head, d_head) so converted HF weights drop in unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.ops.functional import softmax_n

__all__ = ["rel_shift_bnij", "xlnet_rel_attn_core_n", "XLNetAttentionConfig"]


@dataclasses.dataclass(frozen=True)
class XLNetAttentionConfig:
    """Config for XLNet-style relative attention (the surgery target).

    model_type mirrors HF so string-keyed registry lookups resolve."""

    n_head: int = 12
    d_head: int = 64
    softmax_n: float = 0.0
    model_type: str = "xlnet"


def rel_shift_bnij(x: jax.Array, klen: int) -> jax.Array:
    """Relative-shift trick: (b, n, i, j) position scores -> aligned scores.

    Drops the first column after a transpose-reshape so that row i lines up
    with relative distance (i - j), then truncates to klen.
    """
    b, n, i, j = x.shape
    x = x.reshape(b, n, j, i)
    x = x[:, :, 1:, :]
    x = x.reshape(b, n, i, j - 1)
    return x[:, :, :, :klen]


def xlnet_rel_attn_core_n(
    q_head: jax.Array,
    k_head_h: jax.Array,
    v_head_h: jax.Array,
    k_head_r: jax.Array,
    *,
    r_w_bias: jax.Array,
    r_r_bias: jax.Array,
    r_s_bias: Optional[jax.Array] = None,
    seg_embed: Optional[jax.Array] = None,
    seg_mat: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    head_mask: Optional[jax.Array] = None,
    scale: float,
    softmax_n_param: float = 0.0,
    dropout_p: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    return_probs: bool = False,
):
    """softmax-N relative attention core (XLNet layout, seq-first).

    q_head (qlen, bsz, n_head, d_head); k_head_h / v_head_h
    (klen, bsz, n_head, d_head); k_head_r (rlen, bsz, n_head, d_head);
    seg_mat (qlen, klen, bsz, 2); attn_mask (qlen, klen, bsz, 1|n_head)
    with 1 = masked (XLNet convention). Returns (qlen, bsz, n_head, d_head),
    or (attn_vec, attn_prob) with ``return_probs`` — attn_prob in the
    reference's (i, j, b, n) layout, post-dropout post-head_mask, exactly
    what the patched ``rel_attn_core`` returns (_xlnet.py:63-73).

    ``dropout_p``/``dropout_key``: attention-probability dropout between
    softmax_n and head_mask (the reference keeps ``self.dropout`` live for
    fine-tuning, _xlnet.py:63).
    """
    if softmax_n_param < 0:
        raise ValueError(
            f"softmax_n_param must be >= 0, got {softmax_n_param}")

    # content-based score
    ac = jnp.einsum("ibnd,jbnd->bnij", q_head + r_w_bias, k_head_h)
    # position-based score, aligned by the relative shift
    bd = jnp.einsum("ibnd,jbnd->bnij", q_head + r_r_bias, k_head_r)
    bd = rel_shift_bnij(bd, klen=ac.shape[3])
    # segment-based score
    if seg_mat is None:
        ef = 0.0
    else:
        ef = jnp.einsum("ibnd,snd->ibns", q_head + r_s_bias, seg_embed)
        ef = jnp.einsum("ijbs,ibns->bnij", seg_mat, ef)

    attn_score = (ac + bd + ef) * scale
    if attn_mask is not None:
        # dtype-aware large-negative fill (fp16 can't hold 1e30)
        fill = 65500.0 if attn_mask.dtype == jnp.float16 else 1e30
        attn_score = attn_score - fill * jnp.einsum(
            "ijbn->bnij", attn_mask.astype(attn_score.dtype))

    # the one-line change relative to standard XLNet (reference _xlnet.py:62)
    attn_prob = softmax_n(attn_score, n=softmax_n_param, axis=3)

    if dropout_p > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_p > 0 requires dropout_key")
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_p,
                                    attn_prob.shape)
        attn_prob = jnp.where(keep, attn_prob / (1.0 - dropout_p), 0.0)

    if head_mask is not None:
        attn_prob = attn_prob * jnp.einsum("ijbn->bnij", head_mask)

    attn_vec = jnp.einsum("bnij,jbnd->ibnd",
                          attn_prob.astype(v_head_h.dtype), v_head_h)
    if return_probs:
        return attn_vec, jnp.einsum("bnij->ijbn", attn_prob)
    return attn_vec
