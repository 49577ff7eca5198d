"""Fused decode attention: softmax-N over a (quantized) KV cache.

The serving-side hot kernel (north star: "softmax1 7B decode with INT8
KV-cache at speed-of-light fused dequant+flash-attn"). One Pallas kernel
computes, per (batch-slot, kv-head) and per KV tile streamed through VMEM:

  * s   = q_g @ k_tile^T      (int8/fp8 values cast in VMEM; MXU, f32 acc)
  * s  *= k_scale[tile] * sm_scale   — dequant folded after the matmul
    (exact: per-position scales are constant along the contracted head_dim)
  * online-softmax (m, l) update with the phantom-key init (m0=0, l0=n)
    so the softmax-N denominator needs no epilogue correction
  * p  *= v_scale[tile]; acc += p @ v_tile

Length-awareness: per-slot lengths ride scalar prefetch
(PrefetchScalarGridSpec), and the KV block index map CLAMPS out-of-range
tiles to the last valid tile — Pallas skips the DMA for repeated tiles, so
HBM traffic scales with the true sequence length, not the padded cache
(compute for the repeats is predicated off).

Decode is HBM-bound, so int8 halves (fp8 likewise) the step-time floor vs a
bf16 cache — that, not the MXU, is what this kernel buys.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_n"]

NEG_INF = -0.7 * float(np.finfo(np.float32).max)
LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _kernel(n: float, out_dtype, block_s: int, num_s_blocks: int,
            quantized: bool, int8_compute: bool,
            # refs:
            lens_ref,  # scalar prefetch (B,)
            q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
            m_scr, l_scr, acc_scr):
    b = pl.program_id(0)
    isb = pl.program_id(2)

    @pl.when(isb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, 0.0 if n > 0 else NEG_INF)
        l_scr[...] = jnp.full_like(l_scr, float(n))
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b]
    # tiles fully past the sequence are clamped repeats — skip their compute
    in_range = isb * block_s < length

    @pl.when(in_range)
    def _body():
        q = q_ref[0, 0]  # (G, hd): bf16 pre-scaled by sm_scale, or int8
        k = k_ref[0, 0]  # (block_s, hd) int8/fp8/bf16
        if int8_compute:
            # INT-FlashAttention path: int8 x int8 on the MXU; k/v are
            # NEVER cast (the cast was the VPU bottleneck), dequant rides
            # the (G, block_s) epilogue as rank-1 scales.
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * qs_ref[0, 0]  # (G, 1) per-row q scales (incl. sm_scale)
        else:
            s = jax.lax.dot_general(
                q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, block_s)
        if quantized:
            s = s * ks_ref[0, 0][:, 0][None, :]  # per-position k scales
        k_pos = isb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < length, s, NEG_INF)

        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        if quantized:
            p = p * vs_ref[0, 0][:, 0][None, :]  # fold v scales into probs
        v = v_ref[0, 0]
        if int8_compute:
            # quantize the (v-scaled) probabilities per row so PV is int8
            r_max = jnp.max(p, axis=1, keepdims=True)
            r_scale = jnp.where(r_max == 0.0, 1.0, r_max / 127.0)
            r_int = jnp.clip(jnp.round(p / r_scale), -128, 127).astype(
                jnp.int8)
            pv = jax.lax.dot_general(
                r_int, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * r_scale
        else:
            cd = jnp.float32 if v.dtype == jnp.float32 else jnp.bfloat16
            pv = jax.lax.dot_general(
                p.astype(cd), v.astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(isb == num_s_blocks - 1)
    def _epilogue():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe[:, :1]).astype(o_ref.dtype)


def decode_attention_n(
    q: jax.Array,
    k_values: jax.Array,
    v_values: jax.Array,
    lengths: jax.Array,
    *,
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
    softmax_n_param: float = 0.0,
    scale: Optional[float] = None,
    block_s: Optional[int] = None,
    int8_compute: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-token attention over a padded (optionally quantized) KV cache.

    q (B, H, hd) bf16/f32; k/v_values (B, KVH, S, hd) — int8, fp8, or dense;
    k/v_scales (B, KVH, S, 1) f32 when quantized; lengths (B,) int32 — valid
    keys per slot. Returns (B, H, hd) in q's dtype. H must be a multiple of
    KVH (GQA group attention: each kv head serves H/KVH query heads).

    ``int8_compute`` (default: on for int8 caches): INT-FlashAttention-style
    integer math — q is quantized per row outside the kernel and the
    probabilities per row inside it, so QK^T and PV run int8 x int8 on the
    MXU and the cached values are never cast (the int8->bf16 VPU cast is
    otherwise the decode bottleneck). Adds ~0.5% relative error on top of
    the cache quantization.
    """
    batch, heads, hd = q.shape
    _, kvh, s_len, _ = k_values.shape
    group = heads // kvh
    quantized = k_scales is not None
    if scale is None:
        scale = hd ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if int8_compute is None:
        int8_compute = quantized and k_values.dtype == jnp.int8
    if int8_compute and (not quantized or k_values.dtype != jnp.int8):
        raise ValueError("int8_compute requires an int8-quantized cache")

    # pad head_dim to lanes, group to sublanes
    hd_p = _round_up(hd, LANES)
    g_p = max(8, _round_up(group, 8))
    if block_s is None:
        # big contiguous tiles amortize per-step pipeline overhead;
        # int8 tiles are half the bytes so go wider
        block_s = 4096 if quantized else 2048
    block_s = min(block_s, _round_up(s_len, 128))
    s_p = _round_up(s_len, block_s)
    n_sb = s_p // block_s

    qg = q.reshape(batch, kvh, group, hd).astype(jnp.float32) * scale
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_p - group), (0, hd_p - hd)))
    if int8_compute:
        # per-row symmetric q quantization (sm_scale already folded in)
        q_absmax = jnp.max(jnp.abs(qg), axis=-1, keepdims=True)
        q_scales = jnp.where(q_absmax == 0, 1.0, q_absmax / 127.0)
        qv = jnp.clip(jnp.round(qg / q_scales), -128, 127).astype(jnp.int8)
    else:
        qv = qg.astype(q.dtype)
        q_scales = jnp.ones((batch, kvh, g_p, 1), jnp.float32)
    kp = jnp.pad(k_values, ((0, 0), (0, 0), (0, s_p - s_len), (0, hd_p - hd)))
    vp = jnp.pad(v_values, ((0, 0), (0, 0), (0, s_p - s_len), (0, hd_p - hd)))
    if quantized:
        ksp = jnp.pad(k_scales, ((0, 0), (0, 0), (0, s_p - s_len), (0, 0)))
        vsp = jnp.pad(v_scales, ((0, 0), (0, 0), (0, s_p - s_len), (0, 0)))
    else:
        # dummy 1-tile scales (never read; keeps one kernel signature)
        ksp = jnp.ones((batch, kvh, block_s, 1), jnp.float32)
        vsp = ksp

    lengths = lengths.astype(jnp.int32)

    def kv_index(b, h, isb, lens):
        # clamp to the last in-range tile -> repeated index -> DMA skipped
        last = jax.lax.max(_cdiv_dyn(lens[b], block_s) - 1, 0)
        return (b, h, jnp.minimum(isb, last), 0)

    def scale_index(b, h, isb, lens):
        if quantized:
            return kv_index(b, h, isb, lens)
        return (b, h, 0, 0)

    def _cdiv_dyn(a, b):
        return jax.lax.div(a + (b - 1), b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, kvh, n_sb),
        in_specs=[
            pl.BlockSpec((1, 1, g_p, hd_p), lambda b, h, isb, lens: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, g_p, 1), lambda b, h, isb, lens: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_s, hd_p), kv_index),
            pl.BlockSpec((1, 1, block_s, 1), scale_index),
            pl.BlockSpec((1, 1, block_s, hd_p), kv_index),
            pl.BlockSpec((1, 1, block_s, 1), scale_index),
        ],
        out_specs=pl.BlockSpec((1, 1, g_p, hd_p),
                               lambda b, h, isb, lens: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g_p, LANES), jnp.float32),
            pltpu.VMEM((g_p, LANES), jnp.float32),
            pltpu.VMEM((g_p, hd_p), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, float(softmax_n_param), q.dtype, block_s,
                          n_sb, quantized, int8_compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, kvh, g_p, hd_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(lengths, qv, q_scales, kp, ksp, vp, vsp)

    return out[:, :, :group, :hd].reshape(batch, heads, hd)
