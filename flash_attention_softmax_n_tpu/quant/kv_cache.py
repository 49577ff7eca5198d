"""Quantized KV cache: INT8 / FP8 storage with per-token-per-head scales.

North-star capability (BASELINE.json): softmax-N suppresses activation
outliers, so the KV cache quantizes aggressively — INT8 (or FP8) values with
one f32 scale per (layer, batch, head, position), halving decode-time HBM
traffic for the cache (the decode bottleneck).

Dequantization is folded into the attention math instead of materializing
f32 K/V:

  * scores = (q @ k_int^T) * k_scale[position]   — scale applied after the
    matmul (exact: scales are constant along the contracted head_dim), and
  * ctx = (probs * v_scale[position]) @ v_int    — scale folded into the
    probabilities (exact for the same reason).

Both folds are O(S) multiplies instead of O(S * head_dim) dequant work.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.ops.functional import softmax_n
from flash_attention_softmax_n_tpu.quant.qtensor import (
    FP8_MAX,
    INT8_MAX,
    QTensor,
)

__all__ = [
    "init_quantized_kv_cache",
    "quantize_kv",
    "update_quantized_cache",
    "cached_attention_quantized",
]

NEG_INF = -1e30


def init_quantized_kv_cache(n_layers: int, batch: int, n_kv_heads: int,
                            max_len: int, head_dim: int,
                            mode: str = "int8") -> Dict:
    """Cache pytree with QTensor k/v. mode: 'int8' or 'fp8'."""
    shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
    sshape = (n_layers, batch, n_kv_heads, max_len, 1)
    if mode == "int8":
        dt, bits = jnp.int8, 8
    elif mode == "fp8":
        dt, bits = jnp.float8_e4m3fn, -8
    else:
        raise ValueError(f"unknown KV quantization mode {mode!r}")

    # k and v must be DISTINCT buffers: sharing one array object between
    # them double-donates a single buffer when the cache is donated
    # (jit(donate_argnames='cache')), which the runtime rejects
    def qt():
        return QTensor(jnp.zeros(shape, dt), jnp.zeros(sshape, jnp.float32),
                       bits=bits)

    return {
        "k": qt(),
        "v": qt(),
        "length": jnp.zeros((), jnp.int32),
    }


def quantize_kv(x: jax.Array, bits: int) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric quantization along head_dim (last axis).

    x (..., S, head_dim) -> (values, scales (..., S, 1)).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    qmax = INT8_MAX if bits == 8 else FP8_MAX
    scales = absmax / qmax
    safe = jnp.where(scales == 0, 1.0, scales)
    if bits == 8:
        values = jnp.clip(jnp.round(xf / safe), -128, 127).astype(jnp.int8)
    else:
        values = (xf / safe).astype(jnp.float8_e4m3fn)
    return values, scales


def update_quantized_cache(cache_kv: QTensor, new: jax.Array,
                           pos) -> QTensor:
    """Quantize ``new`` (B, KVH, L, hd) and write it at position ``pos``."""
    bits = 8 if cache_kv.bits == 8 else -8
    values, scales = quantize_kv(new, 8 if bits == 8 else -8)
    idx = (0, 0, pos, 0)
    return QTensor(
        jax.lax.dynamic_update_slice(
            cache_kv.values, values.astype(cache_kv.values.dtype), idx),
        jax.lax.dynamic_update_slice(cache_kv.scales, scales, idx),
        bits=cache_kv.bits,
    )


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, kvh, l, hd = x.shape
    return jnp.broadcast_to(
        x[:, :, None], (b, kvh, n_rep, l, hd)
    ).reshape(b, kvh * n_rep, l, hd)


def cached_attention_quantized(q: jax.Array, k_cache: QTensor,
                               v_cache: QTensor, length, *,
                               softmax_n_param: float, scale: float,
                               compute_dtype=jnp.bfloat16) -> jax.Array:
    """Single-step attention over a quantized cache with softmax-N.

    q (B, H, Lq, hd); cache values (B, KVH, S, hd) + scales (B, KVH, S, 1).
    Valid keys are [0, length). Dequant rides the matmuls (see module doc).
    """
    n_rep = q.shape[1] // k_cache.values.shape[1]
    kv = _repeat_kv(k_cache.values, n_rep)
    ks = _repeat_kv(k_cache.scales, n_rep)  # (B, H, S, 1)
    vv = _repeat_kv(v_cache.values, n_rep)
    vs = _repeat_kv(v_cache.scales, n_rep)

    scores = jnp.einsum(
        "bhle,bhse->bhls", q.astype(compute_dtype), kv.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    # k dequant: one multiply per (query, key) — scales transpose to (B,H,1,S)
    scores = scores * jnp.swapaxes(ks, -1, -2) * scale
    s = kv.shape[2]
    valid = jnp.arange(s)[None, None, None, :] < length
    scores = jnp.where(valid, scores, NEG_INF)
    probs = softmax_n(scores, n=softmax_n_param, axis=-1)
    # v dequant folded into probs: (B,H,Lq,S) * (B,H,1,S)
    probs = probs * jnp.swapaxes(vs, -1, -2)
    ctx = jnp.einsum(
        "bhls,bhsv->bhlv", probs.astype(compute_dtype),
        vv.astype(compute_dtype), preferred_element_type=jnp.float32,
    )
    return ctx.astype(compute_dtype)
