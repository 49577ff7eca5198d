"""Shared test fixtures: random QKV and the analytic softmax-N oracles.

JAX re-design of the reference's tests/common.py:11-44. The analytic oracle:
with Q = K = V = w * ones, every score is a = w^2 * E * scale, so

    unmasked:  out = w * S / (n * exp(-a) + S)            (common.py:33-35)
    causal:    row l (1-indexed, S >= L) sees (l + S - L) keys:
               out_l = w * (l + S - L) / (n * exp(-a) + (l + S - L))
                                                           (common.py:42-44)

These validate *absolute* correctness of every implementation, including the
n-term, with no reference implementation in the loop.
"""

import math

import jax
import jax.numpy as jnp


def get_query_key_value(rng, batch_shape, seq_len, embed_dim, dtype=jnp.float32,
                        kv_seq_len=None, v_embed_dim=None):
    """Random normal (mean 0, std 0.5) q/k/v, mirroring reference common.py:18-21."""
    if isinstance(batch_shape, int):
        batch_shape = (batch_shape,)
    kv_seq_len = seq_len if kv_seq_len is None else kv_seq_len
    v_embed_dim = embed_dim if v_embed_dim is None else v_embed_dim
    kq, kk, kv = jax.random.split(rng, 3)
    q = 0.5 * jax.random.normal(kq, (*batch_shape, seq_len, embed_dim), dtype)
    k = 0.5 * jax.random.normal(kk, (*batch_shape, kv_seq_len, embed_dim), dtype)
    v = 0.5 * jax.random.normal(kv, (*batch_shape, kv_seq_len, v_embed_dim), dtype)
    return q, k, v


def constant_qkv(batch_shape, L, S, E, Ev, weight, dtype=jnp.float32):
    if isinstance(batch_shape, int):
        batch_shape = (batch_shape,)
    q = jnp.full((*batch_shape, L, E), weight, dtype)
    k = jnp.full((*batch_shape, S, E), weight, dtype)
    v = jnp.full((*batch_shape, S, Ev), weight, dtype)
    return q, k, v


def attention_analytic_answer(batch_shape, L, S, E, Ev, scale, weight, n,
                              dtype=jnp.float32):
    """Expected output of softmax-N attention on constant inputs (unmasked)."""
    if isinstance(batch_shape, int):
        batch_shape = (batch_shape,)
    a = weight * weight * E * scale
    factor = S / (n * math.exp(-a) + S)
    return jnp.full((*batch_shape, L, Ev), weight * factor, dtype)


def attention_analytic_causal_answer(batch_shape, L, S, E, Ev, scale, weight, n,
                                     dtype=jnp.float32):
    """Expected output with the rectangular causal mask (S >= L)."""
    if isinstance(batch_shape, int):
        batch_shape = (batch_shape,)
    a = weight * weight * E * scale
    rows = []
    for ell in range(1, L + 1):
        visible = ell + S - L
        rows.append(weight * visible / (n * math.exp(-a) + visible))
    col = jnp.asarray(rows, jnp.float32)[:, None]
    return jnp.broadcast_to(col, (*batch_shape, L, Ev)).astype(dtype)
