"""Shared model building blocks: norms, RoPE, initializers.

All functions are pure jnp on explicit parameter pytrees — no module
framework. Compute-heavy paths (attention) route through the fused Pallas
kernel; everything here is XLA-fusable elementwise/matmul work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "rope_frequencies", "apply_rope", "gelu"]


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in f32 with cast back to the input dtype."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-12) -> jax.Array:
    """LayerNorm in f32 (HF BERT uses eps=1e-12)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0):
    """(max_len, head_dim//2) cos/sin tables for rotary embeddings."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (max_len, head_dim//2)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               positions: jax.Array) -> jax.Array:
    """Rotate (B, H, L, E) by position-indexed tables.

    ``positions`` is (B, L) or (L,) absolute positions (supports KV-cache
    decode where the single query sits at an arbitrary offset).
    """
    if positions.ndim == 1:
        positions = positions[None, :]
    c = cos[positions][:, None]  # (B, 1, L, E//2)
    s = sin[positions][:, None]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return rotated.astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GeLU, matching HF BERT's default."""
    return jax.nn.gelu(x, approximate=False)
