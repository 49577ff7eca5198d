"""Fused decode attention: softmax-N over a (quantized) KV cache.

The serving-side hot kernel (north star: "softmax1 7B decode with INT8
KV-cache at speed-of-light fused dequant+flash-attn"). Decode is HBM-bound:
the step-time floor is the bytes of KV cache streamed, so the kernel's job
is (a) never read padded tail tiles, (b) keep DMAs large, (c) for int8/fp8
caches never upcast in HBM — dequant rides the epilogue as rank-1 scales.

Design (v2):

  * grid ``(batch, seq_tiles)`` with ALL kv heads folded into each block —
    one (KVH, block_s, hd) tile per DMA instead of per-head slivers, so the
    per-grid-step pipeline overhead amortizes over 16x more bytes (measured
    2x end-to-end on v5e vs the per-head grid).
  * per-slot lengths ride scalar prefetch; out-of-range tiles are clamped
    to the last valid tile index — Pallas skips the DMA for repeated
    indices and ``@pl.when`` predicates off their compute, so HBM traffic
    scales with the TRUE length, not the padded cache.
  * the kernel returns UNNORMALIZED flash statistics ``(acc, m, l)`` —
    softmax-0 online-softmax over the cache only. The softmax-N ``+n``
    term (reference flash_attn_triton.py:114 applies it once at final
    normalization) and the current token's self-attention term are merged
    in a tiny XLA epilogue over (B, H) scalars. This keeps one kernel for
    n=0/n>0, lets the engine attend BEFORE the cache write lands (the new
    token's k/v enter via the epilogue), and reuses the same associative
    merge as ring attention (parallel/ring_attention.py).
  * int8 caches optionally run INT-FlashAttention-style integer math: q is
    per-row-quantized outside, probabilities per-row-requantized inside,
    so QK^T and PV hit the MXU in int8 and cached values are NEVER cast.

Reference parity: generalizes slow_attention_n (core/functional.py:32-93)
to the decode case (L=1, per-slot rectangular lengths).
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


def _kernel(num_s_blocks: int, quantized: bool, int8_compute: bool,
            # refs:
            lens_ref,  # scalar prefetch (B,)
            q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
            acc_ref, m_ref, l_ref,
            m_scr, l_scr, acc_scr):
    b = pl.program_id(0)
    isb = pl.program_id(1)

    @pl.when(isb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b]
    block_s = k_ref.shape[2]
    in_range = isb * block_s < length

    @pl.when(in_range)
    def _body():
        q = q_ref[0]  # (KVH, G, hd): bf16 pre-scaled by sm_scale, or int8
        k = k_ref[0]  # (KVH, block_s, hd) int8/fp8/bf16
        if int8_compute:
            # INT-FlashAttention path: int8 x int8 on the MXU; k/v are
            # NEVER cast (the cast was the VPU bottleneck); dequant rides
            # the (KVH, G, block_s) epilogue as rank-1 scales.
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * qs_ref[0]  # (KVH, G, 1) per-row q scales (incl. scale)
        else:
            s = jax.lax.dot_general(
                q, k.astype(q.dtype), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (KVH, G, block_s)
        if quantized:
            # per-position k scales (KVH, block_s, 1) -> (KVH, 1, block_s)
            s = s * jnp.swapaxes(ks_ref[0], 1, 2)
        k_pos = isb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 2)
        s = jnp.where(k_pos < length, s, NEG_INF)

        m_prev = m_scr[...][:, :, :1]   # (KVH, G, 1)
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_new = l_scr[...][:, :, :1] * alpha + jnp.sum(p, axis=2,
                                                       keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
        if quantized:
            p = p * jnp.swapaxes(vs_ref[0], 1, 2)  # fold v scales into probs
        v = v_ref[0]
        if int8_compute:
            # per-row re-quantization so PV runs int8 x int8 as well
            r_max = jnp.max(p, axis=2, keepdims=True)
            r_scale = jnp.where(r_max == 0.0, 1.0, r_max / 127.0)
            r_int = jnp.clip(jnp.round(p / r_scale), -128, 127).astype(
                jnp.int8)
            pv = jax.lax.dot_general(
                r_int, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * r_scale
        else:
            cd = jnp.float32 if v.dtype == jnp.float32 else jnp.bfloat16
            pv = jax.lax.dot_general(
                p.astype(cd), v.astype(cd), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(isb == num_s_blocks - 1)
    def _epilogue():
        acc_ref[0] = acc_scr[...]
        m_ref[0] = m_scr[...]
        l_ref[0] = l_scr[...]


def _decode_attn_stats(
    q: jax.Array,          # (B, KVH, G, hd) f32, pre-scaled
    k_values: jax.Array,   # (B, KVH, S, hd)
    v_values: jax.Array,
    lengths: jax.Array,    # (B,)
    k_scales: Optional[jax.Array],
    v_scales: Optional[jax.Array],
    *,
    int8_compute: bool,
    in_dtype,
    block_s: Optional[int],
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas launch: returns unnormalized (acc, m, l) over the cache.

    acc (B, KVH, G, hd) f32; m, l (B, KVH, G) f32. Rows with length 0 come
    back as (acc=0, m=-inf, l=0).
    """
    batch, kvh, group, hd = q.shape
    s_len = k_values.shape[2]
    quantized = k_scales is not None

    # sub-128 head dims run UNPADDED (same rule as the prefill flash
    # kernel): padding 64 -> 128 doubled every k/v DMA byte AND — much
    # worse — materialized a fresh padded copy of the ENTIRE cache in HBM
    # every decode step via jnp.pad, which is why this kernel measured 22ms
    # vs XLA's 1.9ms at b=32/S=2048 in round 1. With hd and S block-aligned
    # the pads below are zero-width and XLA elides them.
    hd_p = hd if hd in (32, 64) else _round_up(hd, LANES)
    g_p = max(8, _round_up(group, 8))
    if block_s is None:
        # 512-row tiles exceed the 16MB scoped-VMEM budget in some program
        # compositions (batched-dot widening); 256 measures as fast or
        # faster and always fits
        block_s = 256
    block_s = min(block_s, _round_up(s_len, 128))
    s_p = _round_up(s_len, block_s)
    n_sb = s_p // block_s

    if int8_compute:
        q_absmax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        q_scales = jnp.where(q_absmax == 0, 1.0, q_absmax / 127.0)
        qv = jnp.clip(jnp.round(q / q_scales), -128, 127).astype(jnp.int8)
    else:
        qv = q.astype(in_dtype)
        q_scales = jnp.ones((batch, kvh, group, 1), jnp.float32)
    qv = jnp.pad(qv, ((0, 0), (0, 0), (0, g_p - group), (0, hd_p - hd)))
    q_scales = jnp.pad(q_scales, ((0, 0), (0, 0), (0, g_p - group), (0, 0)),
                       constant_values=1.0)

    kp = jnp.pad(k_values, ((0, 0), (0, 0), (0, s_p - s_len), (0, hd_p - hd)))
    vp = jnp.pad(v_values, ((0, 0), (0, 0), (0, s_p - s_len), (0, hd_p - hd)))
    if quantized:
        ksp = jnp.pad(k_scales, ((0, 0), (0, 0), (0, s_p - s_len), (0, 0)))
        vsp = jnp.pad(v_scales, ((0, 0), (0, 0), (0, s_p - s_len), (0, 0)))
    else:
        ksp = jnp.ones((batch, kvh, block_s, 1), jnp.float32)
        vsp = ksp

    lengths = lengths.astype(jnp.int32)

    def _cdiv_dyn(a, b):
        return jax.lax.div(a + (b - 1), b)

    def kv_index(b, isb, lens):
        # clamp to the last in-range tile -> repeated index -> DMA skipped
        last = jax.lax.max(_cdiv_dyn(lens[b], block_s) - 1, 0)
        return (b, 0, jnp.minimum(isb, last), 0)

    def scale_index(b, isb, lens):
        if quantized:
            return kv_index(b, isb, lens)
        return (b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, n_sb),
        in_specs=[
            pl.BlockSpec((1, kvh, g_p, hd_p), lambda b, isb, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, kvh, g_p, 1), lambda b, isb, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, kvh, block_s, hd_p), kv_index),
            pl.BlockSpec((1, kvh, block_s, 1), scale_index),
            pl.BlockSpec((1, kvh, block_s, hd_p), kv_index),
            pl.BlockSpec((1, kvh, block_s, 1), scale_index),
        ],
        out_specs=[
            pl.BlockSpec((1, kvh, g_p, hd_p), lambda b, isb, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, kvh, g_p, LANES), lambda b, isb, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, kvh, g_p, LANES), lambda b, isb, lens: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((kvh, g_p, LANES), jnp.float32),
            pltpu.VMEM((kvh, g_p, LANES), jnp.float32),
            pltpu.VMEM((kvh, g_p, hd_p), jnp.float32),
        ],
    )

    acc, m, l = pl.pallas_call(
        functools.partial(_kernel, n_sb, quantized, int8_compute),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, kvh, g_p, hd_p), jnp.float32),
            jax.ShapeDtypeStruct((batch, kvh, g_p, LANES), jnp.float32),
            jax.ShapeDtypeStruct((batch, kvh, g_p, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(lengths, qv, q_scales, kp, ksp, vp, vsp)

    return (acc[:, :, :group, :hd], m[:, :, :group, 0], l[:, :, :group, 0])


def _decode_attn_stats_xla(
    q: jax.Array,          # (B, KVH, G, hd) f32, pre-scaled
    k_values: jax.Array,
    v_values: jax.Array,
    lengths: jax.Array,
    k_scales: Optional[jax.Array],
    v_scales: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """XLA formulation of the same unnormalized (acc, m, l) stats.

    On small-batch decode XLA's batched-matvec lowering (VPU) currently
    beats the Pallas kernel's per-head MXU dispatch for int8 caches; the
    engine picks per backend/dtype. Reads the full padded cache (no
    length-clamped DMA skip).
    """
    quantized = k_scales is not None
    cd = jnp.bfloat16 if k_values.dtype != jnp.float32 else jnp.float32
    s = jnp.einsum("bkge,bkse->bkgs", q.astype(cd), k_values.astype(cd),
                   preferred_element_type=jnp.float32)
    if quantized:
        s = s * jnp.swapaxes(k_scales, -1, -2)[:, :, None, 0, :]
    s_len = k_values.shape[2]
    valid = (jnp.arange(s_len)[None, None, None, :]
             < lengths[:, None, None, None])
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    p = jnp.where(valid, p, 0.0)  # rows with length 0: exp(0)=1 -> mask
    l = jnp.sum(p, axis=-1)
    if quantized:
        p = p * jnp.swapaxes(v_scales, -1, -2)[:, :, None, 0, :]
    acc = jnp.einsum("bkgs,bksd->bkgd", p.astype(cd), v_values.astype(cd),
                     preferred_element_type=jnp.float32)
    return acc, m, l


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
    k_new: Optional[jax.Array] = None,
    v_new: Optional[jax.Array] = None,
    k_tail: Optional[jax.Array] = None,
    v_tail: Optional[jax.Array] = None,
    tail_lengths: Optional[jax.Array] = None,
    block_s: Optional[int] = None,
    int8_compute: Optional[bool] = None,
    interpret: Optional[bool] = None,
    implementation: str = "pallas",
) -> jax.Array:
    """Single-token softmax-N attention over a padded (quantized) KV cache.

    q (B, H, hd) bf16/f32; k/v_values (B, KVH, S, hd) — int8, fp8, or dense;
    k/v_scales (B, KVH, S, 1) f32 when quantized; lengths (B,) int32 — valid
    keys per slot. H must be a multiple of KVH (GQA: each kv head serves
    H/KVH query heads). Returns (B, H, hd) in q's dtype.

    ``k_new``/``v_new`` (B, KVH, hd), optional: the CURRENT token's k/v,
    attended as one extra key at position ``lengths[b]`` without touching
    the cache — the engine writes the cache seperately (and in place) via
    kernels/cache_update.py, so attention never waits on the write.

    ``int8_compute`` (default: OFF — the v5e MXU probe measured int8xint8
    dots slower than bf16 under Mosaic): INT-FlashAttention-style integer
    math — QK^T and PV run int8 x int8 on the MXU and cached values are
    never cast. Adds ~0.5% relative error on top of cache quantization;
    opt in with int8_compute=True where the probe says it wins.

    The ``+n`` denominator term is applied exactly once, at final
    normalization, in the running max's numeraire — the invariant the
    reference establishes at core/flash_attn_triton.py:114.
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
        # default OFF even for int8 caches: the v5e MXU probe (bench.py,
        # CLAUDE.md) measured int8 x int8 dots SLOWER than bf16 under
        # Mosaic, while the int8->bf16 cast fused into a dot is ~free —
        # integer math saves nothing here. Opt in explicitly for chips
        # where the probe says otherwise.
        int8_compute = False
    if int8_compute and (not quantized or k_values.dtype != jnp.int8):
        raise ValueError("int8_compute requires an int8-quantized cache")

    qg = q.reshape(batch, kvh, group, hd).astype(jnp.float32) * scale

    if implementation not in ("xla", "pallas"):
        raise ValueError(
            f"unknown decode attention implementation {implementation!r}; "
            "expected 'xla' or 'pallas' (cfg.decode_attn_impl)")
    if implementation == "xla":
        acc, m, l = _decode_attn_stats_xla(
            qg, k_values, v_values, lengths, k_scales, v_scales)
    else:
        acc, m, l = _decode_attn_stats(
            qg, k_values, v_values, lengths, k_scales, v_scales,
            int8_compute=int8_compute, in_dtype=q.dtype, block_s=block_s,
            interpret=interpret)

    # -- XLA epilogue: merge tail window + self-term, apply +n once --------
    if k_tail is not None:
        # recent-token window (B, KVH, W, hd), bf16, written at a SHARED
        # ring index by the fused decode loop (engine_decode_loop) so the
        # main cache needs no per-slot scatter inside the loop. Row j of
        # the tail is position lengths[b] - tail_lengths[b] + j; only rows
        # j < tail_lengths[b] are valid.
        w = k_tail.shape[2]
        cd_t = (jnp.float32 if k_tail.dtype == jnp.float32
                else jnp.bfloat16)
        s_t = jnp.einsum("bkge,bkwe->bkgw", qg.astype(cd_t),
                         k_tail.astype(cd_t),
                         preferred_element_type=jnp.float32)
        valid_t = (jnp.arange(w)[None, None, None, :]
                   < tail_lengths[:, None, None, None])
        s_t = jnp.where(valid_t, s_t, NEG_INF)
        m_t = jnp.max(s_t, axis=-1)
        p_t = jnp.where(valid_t, jnp.exp(s_t - m_t[..., None]), 0.0)
        l_t = jnp.sum(p_t, axis=-1)
        acc_t = jnp.einsum("bkgw,bkwe->bkge", p_t.astype(cd_t),
                           v_tail.astype(cd_t),
                           preferred_element_type=jnp.float32)
        m_next = jnp.maximum(m, m_t)
        a1 = jnp.where(l > 0, jnp.exp(m - m_next), 0.0)
        a2 = jnp.where(l_t > 0, jnp.exp(m_t - m_next), 0.0)
        acc = acc * a1[..., None] + acc_t * a2[..., None]
        l = l * a1 + l_t * a2
        m = m_next

    if k_new is not None:
        s_self = jnp.einsum(
            "bkge,bke->bkg", qg, k_new.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        m_next = jnp.maximum(m, s_self)
        alpha = jnp.exp(m - m_next)
        p_self = jnp.exp(s_self - m_next)
        acc = (acc * alpha[..., None]
               + p_self[..., None] * v_new[:, :, None, :].astype(jnp.float32))
        l = l * alpha + p_self
        m = m_next

    n = float(softmax_n_param)
    if n > 0.0:
        # n * exp(0 - m): the phantom key scores 0 (reference
        # core/flash_attn.py:66-67 pads K with zero rows)
        l = l + n * jnp.exp(jnp.maximum(-m, NEG_INF))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / l_safe[..., None]
    return out.reshape(batch, heads, hd).astype(q.dtype)
