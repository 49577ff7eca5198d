"""Fused flash-attention with softmax-N as a Pallas TPU kernel.

This is the TPU-native replacement for BOTH fused paths of the reference
library (reference: flash_attention_softmax_n/core/flash_attn.py:42-124 —
the integer-n KV-zero-padding trick over torch SDPA — and
core/flash_attn_triton.py — the real-valued-n Triton kernel). Because we own
the kernel, real-valued n is the general case and no padding trick is needed.

The softmax-N trick used here — the *phantom key*
---------------------------------------------------
``softmax_n`` is exactly a standard softmax over the real keys plus one
phantom key with logit 0 and value 0::

    softmax_n(x)_i = exp(x_i) / (n + sum_j exp(x_j))
                   = exp(x_i) / (n * exp(0) + sum_j exp(x_j))

so the online-softmax recurrence (running max ``m``, running sum ``l``,
rescaled accumulator — the same (m, l) algebra as the reference Triton kernel
flash_attn_triton.py:100-114) needs only a different *initial state*:
``m0 = 0, l0 = n`` (for n > 0). The final normalization ``acc / l`` then
yields softmax-N exactly — no epilogue correction term, and fully-masked rows
come out as 0/n = 0 (finite n > 0) instead of NaN, fixing the reference's
documented causal/real-n limitation (reference README.md:45).

The stored residual ``lse = m_final + log(l_final) = log(n + sum_j exp(s_j))``
makes the backward pass *identical* to standard flash-attention backward:
``p = exp(s - lse)`` are exactly the softmax-N probabilities, and

    ds_k = p_k * (dp_k - delta),   delta = rowsum(do * o)

holds for softmax-N too (the same derivation as softmax-0: the ``+n`` only
enters through the normalizer already folded into ``lse``). This proves the
property the reference only observed empirically (its Triton backward is the
unmodified softmax-0 backward, flash_attn_triton.py:146-235).

Layout / performance notes (TPU):
  * Grid is (batch, heads, q_blocks, kv_blocks) with the kv dimension
    innermost ("arbitrary" semantics) so (m, l, acc) live in VMEM scratch
    across the kv sweep; batch/head/q dims are parallel.
  * Scores and accumulator are f32 (MXU ``preferred_element_type``); the PV
    matmul re-casts p to the value dtype (bf16 in, f32 accumulate).
  * Causal blocks entirely above the (rectangular, ``S - L``-offset) diagonal
    are skipped with predicated execution.
  * ALiBi can be generated in-kernel from per-head slopes (zero HBM traffic)
    instead of a materialized (L, S) bias.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention_n_fused", "flash_attention_block_grads",
           "FlashConfig"]

NEG_INF = -0.7 * float(np.finfo(np.float32).max)
# Any real lse satisfies lse > DEAD_LSE (scores are bounded by |q||k|·scale);
# only the fully-masked-row sentinel lse == NEG_INF falls below it. Clamping
# lse to DEAD_LSE in the backward makes p = exp(NEG_INF - DEAD_LSE) = 0 for
# such rows instead of exp(NEG_INF - NEG_INF) = 1 (n == 0 rectangular causal
# with q_len > kv_len — see _epilogue_l below).
DEAD_LSE = 0.5 * NEG_INF
LANES = 128  # TPU vreg lane count; (m, l) scratch is replicated across lanes


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@dataclasses.dataclass(frozen=True)
class FlashConfig:
    """Static kernel configuration (hashable; closed over at trace time)."""

    n: float = 0.0
    scale: float = 1.0
    is_causal: bool = False
    q_len: int = 0  # actual (pre-padding) query length
    kv_len: int = 0  # actual (pre-padding) key/value length
    block_q: int = 1024
    block_k: int = 1024
    has_bias: bool = False
    has_alibi: bool = False
    dropout_rate: float = 0.0
    grad_bias: bool = False  # emit dbias tiles from the backward kernel
    interpret: bool = False
    # forward only: inner emit_pipeline over KV blocks (outer grid drops the
    # kv dimension). Cuts Mosaic grid-step overhead at long S and skips
    # causally-invisible KV blocks via a dynamic inner grid bound.
    inner_pipeline: bool = False

    @property
    def has_dropout(self) -> bool:
        return self.dropout_rate > 0.0


# ----------------------------------------------------------------------------
# In-kernel dropout: a counter-based hash instead of a stateful PRNG.
#
# The reference runs dropout through torch SDPA's fused kernel
# (reference core/flash_attn.py:49,117-124) using cuRAND-style stateful
# streams. On TPU we key every Bernoulli draw on its GLOBAL coordinates
# (seed, batch, head, q_pos, k_pos) with a murmur3-style integer mix: the
# mask is then identical across the forward and both backward kernels by
# construction (no state to replay), independent of block shape, exactly
# reproducible in plain XLA for oracle tests, and free of Mosaic-only
# primitives so interpret mode (CPU CI) covers it too.
# ----------------------------------------------------------------------------

_MIX_A = np.int32(np.uint32(0x9E3779B9))  # golden-ratio odd constants
_MIX_B = np.int32(np.uint32(0x85EBCA6B))
_MIX_C = np.int32(np.uint32(0xC2B2AE35))
_MIX_D = np.int32(np.uint32(0x27D4EB2F))


def _fmix32(x):
    """murmur3 finalizer: int32 -> well-mixed int32 (wrapping arithmetic)."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * _MIX_B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * _MIX_C
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def dropout_keep(seed, b, h, q_pos, k_pos, rate: float):
    """Deterministic Bernoulli(1-rate) keep mask from global coordinates.

    All integer args int32 (scalars or broadcastable arrays). The same
    function, evaluated in plain jnp, is the test oracle for the fused
    dropout path.
    """
    seed = jnp.asarray(seed, jnp.int32) if not isinstance(seed, int) else seed
    x = q_pos * _MIX_A + k_pos * _MIX_B + b * _MIX_C + h * _MIX_D + seed
    u = _fmix32(x) & np.int32(0x7FFFFFFF)  # uniform over [0, 2^31)
    return u >= np.int32(min(int(round(rate * 2147483648.0)), 2147483647))


def _dropout_mult(cfg: FlashConfig, seed, b, h, iq, ik):
    """(block_q, block_k) f32 multiplier: keep/(1-rate) or 0 (inverted dropout)."""
    q_pos = iq * cfg.block_q + jax.lax.broadcasted_iota(
        jnp.int32, (cfg.block_q, cfg.block_k), 0)
    k_pos = ik * cfg.block_k + jax.lax.broadcasted_iota(
        jnp.int32, (cfg.block_q, cfg.block_k), 1)
    keep = dropout_keep(seed, b, h, q_pos, k_pos, cfg.dropout_rate)
    return jnp.where(keep, 1.0 / (1.0 - cfg.dropout_rate), 0.0).astype(
        jnp.float32)


def _causal_offset(cfg: FlashConfig) -> int:
    # Rectangular causal mask: key j visible to query i iff j <= i + (S - L)
    # (reference functional.py:80 tril(diagonal=S-L)).
    return cfg.kv_len - cfg.q_len


def _block_visible(cfg: FlashConfig, iq, ik):
    """Whether kv block ik intersects the causal-visible region of q block iq."""
    k_min = ik * cfg.block_k
    q_max = iq * cfg.block_q + cfg.block_q - 1
    return k_min <= q_max + _causal_offset(cfg)


def _scores(cfg: FlashConfig, q, k, bias, alibi_slope, iq, ik):
    """f32 (block_q, block_k) masked scores for the current tile.

    The scale is pre-folded into q by the caller (one multiply on (L, E)
    instead of (L, S) per step — the same folding the reference applies,
    flash_attn.py:81-83). Masking work is skipped at runtime for interior
    tiles: a tile needs the mask only if it straddles the causal diagonal or
    contains key padding, which a scalar predicate decides per grid step.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    return _mask_scores(cfg, s, alibi_slope, iq, ik)


def _mask_scores(cfg: FlashConfig, s, alibi_slope, iq, ik):
    """ALiBi + causal/padding masking of a raw (block_q, block_k) score
    tile (the post-dot tail of ``_scores``, shared with the transposed
    inner-pipeline layout)."""
    need_alibi = alibi_slope is not None
    k_padded = cfg.kv_len % cfg.block_k != 0

    def pos():
        q_pos = iq * cfg.block_q + jax.lax.broadcasted_iota(
            jnp.int32, (cfg.block_q, cfg.block_k), 0
        )
        k_pos = ik * cfg.block_k + jax.lax.broadcasted_iota(
            jnp.int32, (cfg.block_q, cfg.block_k), 1
        )
        return q_pos, k_pos

    if need_alibi:
        q_pos, k_pos = pos()
        # ALiBi: slope * -(distance); distance measured with the rectangular
        # offset so the last key aligns with the last query.
        dist = (q_pos + _causal_offset(cfg) - k_pos).astype(jnp.float32)
        s = s - alibi_slope * jnp.abs(dist)

    if not cfg.is_causal and not k_padded:
        return s

    def masked(s):
        q_pos, k_pos = pos()
        mask = k_pos < cfg.kv_len
        if cfg.is_causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos + _causal_offset(cfg))
        return jnp.where(mask, s, NEG_INF)

    # Scalar predicate: does this tile straddle the diagonal / padded tail?
    need = jnp.bool_(False)
    if cfg.is_causal:
        # tile is NOT fully visible if its last key can exceed its first
        # query's causal bound
        k_max = ik * cfg.block_k + cfg.block_k - 1
        q_min = iq * cfg.block_q
        need = jnp.logical_or(need, k_max > q_min + _causal_offset(cfg))
    if k_padded:
        need = jnp.logical_or(need, ik == cfg.kv_len // cfg.block_k)
    return jax.lax.cond(need, masked, lambda s: s, s)


def _finalize(cfg: FlashConfig, m, l, acc, out_dtype):
    """Shared forward epilogue: o = acc / l with dead rows made DEFINED.

    Dead rows (a query row with NO visible key) exist only for
    rectangular causal q_len > kv_len (reference functional.py:80 permits
    tril(diagonal=S-L) with S < L). At n == 0 such a row keeps m at the
    NEG_INF init sentinel and every VISITED block accumulated garbage
    p = exp(NEG_INF - NEG_INF) = 1 per key into l AND acc (NEG_INF is
    finite); fully-skipped rows have l == 0. Both emit o = 0 /
    lse = NEG_INF. At n > 0 dead rows are clean already (m0 = 0, l0 = n
    gives 0/n = 0 and the exact lse = log(n)). Every OTHER configuration
    guarantees l > 0 for every row, so the standard epilogue runs
    guard-free — the guard's extra selects cost ~0.3MB VMEM, which the
    2048 single-block config (sitting exactly at the scoped-vmem limit)
    cannot afford. Returns (o, lse) with lse lane-replicated like m."""
    if cfg.n == 0 and cfg.is_causal and _causal_offset(cfg) < 0:
        dead = jnp.logical_or(l == 0.0, m == NEG_INF)
        l_safe = jnp.where(dead, 1.0, l)
        o = jnp.where(dead[:, :1], 0.0,
                      acc / l_safe[:, :1]).astype(out_dtype)
        lse = jnp.where(dead, NEG_INF, m + jnp.log(l_safe))
        return o, lse
    return (acc / l[:, :1]).astype(out_dtype), m + jnp.log(l)


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------


def _parse_in_refs(cfg: FlashConfig, refs):
    """Consume [q, k, v, bias?, alibi?, seed?] from the ref list; returns
    ((q, k, v, b_ref, a_ref, seed_ref), rest)."""
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    b_ref = next(it) if cfg.has_bias else None
    a_ref = next(it) if cfg.has_alibi else None
    seed_ref = next(it) if cfg.has_dropout else None
    return (q_ref, k_ref, v_ref, b_ref, a_ref, seed_ref), list(it)


def _fwd_kernel(cfg: FlashConfig, num_kv_blocks: int, *refs):
    (q_ref, k_ref, v_ref, b_ref, a_ref, seed_ref), rest = _parse_in_refs(
        cfg, refs)
    o_ref, lse_ref, m_scr, l_scr, acc_scr = rest

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        # Phantom-key initialization: m0 = 0, l0 = n puts the +n term into
        # the running denominator exactly once. For n == 0 fall back to the
        # classic -inf-like init (softmax-0 is shift invariant).
        m_scr[...] = jnp.full_like(m_scr, 0.0 if cfg.n > 0 else NEG_INF)
        l_scr[...] = jnp.full_like(l_scr, float(cfg.n))
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        bias = b_ref[0, 0] if b_ref is not None else None
        slope = a_ref[0, 0] if a_ref is not None else None
        s = _scores(cfg, q, k, bias, slope, iq, ik)

        # running stats live lane-replicated in scratch, but the update
        # math runs on single-lane (block_q, 1) slices — the replicated
        # exp/mul on (block_q, LANES) was ~128x redundant VPU work
        m_prev = m_scr[...][:, :1]
        l_prev = l_scr[...][:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        # the softmax denominator is pre-dropout: l accumulates the
        # UNdropped probabilities, the value accumulator the dropped ones
        # (dropout applies to normalized weights; the mask commutes with
        # the deferred normalization)
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        if cfg.has_dropout:
            p = p * _dropout_mult(cfg, seed_ref[0, 0], ib, ih, iq, ik)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    if cfg.is_causal:
        pl.when(_block_visible(cfg, iq, ik))(_body)
    else:
        _body()

    @pl.when(ik == num_kv_blocks - 1)
    def _epilogue():
        # lse = log(n + sum_j exp(s_j)) — the softmax-N normalizer; the lone
        # residual the backward needs (cf. reference flash_attn_triton.py:116).
        o, lse = _finalize(cfg, m_scr[...], l_scr[...], acc_scr[...],
                           o_ref.dtype)
        o_ref[0, 0] = o
        lse_ref[0, 0] = lse[:, :1]


def _fwd_single_kernel(cfg: FlashConfig, *refs):
    """One-pass forward when the KV extent is a SINGLE block (nk == 1).

    The online-softmax machinery (m/l/acc scratch, per-block rescale
    alpha, lane-replicated stat broadcasts) exists only to merge multiple
    KV blocks; with one block a direct softmax-N pass needs none of it.
    Measured on v5e (artifacts/prefill_phase_profile_hd128.json, round 5):
    at B2/H16/L2048/hd128 the full grid kernel ran 1.061 ms while a plain
    single-pass softmax mini-kernel ran 0.894 ms over the same dots —
    the ~16% delta IS this machinery. The auto block policy emits nk == 1
    for every padded length that fits the cap, so this is the hot
    configuration for all prefill at L <= 2048 (and every staircase
    piece).

    Phantom-key math, one-pass form: m = max(rowmax, 0) for n > 0 (the
    phantom key scores 0), l = n*exp(-m) + sum(exp(s - m)); dead-row
    handling for n == 0 rectangular causal stays in _finalize.
    """
    (q_ref, k_ref, v_ref, b_ref, a_ref, seed_ref), rest = _parse_in_refs(
        cfg, refs)
    o_ref, lse_ref = rest

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = b_ref[0, 0] if b_ref is not None else None
    slope = a_ref[0, 0] if a_ref is not None else None
    s = _scores(cfg, q, k, bias, slope, iq, 0)
    m = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    if cfg.n > 0:
        m = jnp.maximum(m, 0.0)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    if cfg.n > 0:
        l = l + cfg.n * jnp.exp(-m)
    if cfg.has_dropout:
        # denominator is pre-dropout (same rule as the grid path)
        p = p * _dropout_mult(cfg, seed_ref[0, 0], ib, ih, iq, 0)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o, lse = _finalize(cfg, m, l, pv, o_ref.dtype)
    o_ref[0, 0] = o
    lse_ref[0, 0] = lse[:, :1]


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd(cfg: FlashConfig, q, k, v, bias, alibi_slopes, seed):
    """Padded-shape forward. q (B,H,Lp,Ep), k/v (B,H,Sp,Ep), bias (b,h,Lp,Sp)."""
    if cfg.inner_pipeline and not cfg.has_bias:
        return _fwd_pipelined(cfg, q, k, v, alibi_slopes, seed)
    q = q * jnp.asarray(cfg.scale, q.dtype)  # fold scale once on (L, E)
    batch, heads, q_len_p, d = q.shape
    kv_len_p = k.shape[2]
    nq = q_len_p // cfg.block_q
    nk = kv_len_p // cfg.block_k

    # single KV block: one-pass softmax kernel, no stats scratch, grid
    # drops the kv dimension (the hot prefill configuration — the auto
    # policy emits nk == 1 whenever the padded lens fit the cap).
    # Fenced to an 8MB f32 score tile: the one-pass form holds s AND
    # exp(s-m) live together, and at (2048, 2048) (16MB scores, the hd64
    # 2048-cap config) Mosaic's compile helper dies where the grid
    # kernel's scratch-reusing form compiles — measured r5, the wide/
    # staircase one-pass wins all sit at <= 8MB.
    single = (nk == 1
              and cfg.block_q * cfg.block_k * 4 <= 8 * 2 ** 20
              and os.environ.get("FASN_SINGLE_PASS", "1") != "0")
    if single:
        kernel = functools.partial(_fwd_single_kernel, cfg)
    else:
        kernel = functools.partial(_fwd_kernel, cfg, nk)

    # index maps accept 3 (single) or 4 (grid) indices via the ik default
    def _qix(b, h, iq, ik=0):
        return (b, h, iq, 0)

    def _kix(b, h, iq, ik=0):
        return (b, h, ik, 0)

    in_specs = [
        pl.BlockSpec((1, 1, cfg.block_q, d), _qix),
        pl.BlockSpec((1, 1, cfg.block_k, d), _kix),
        pl.BlockSpec((1, 1, cfg.block_k, d), _kix),
    ]
    args = [q, k, v]
    if cfg.has_bias:
        bb = 0 if bias.shape[0] == 1 else None
        bh = 0 if bias.shape[1] == 1 else None
        in_specs.append(
            pl.BlockSpec(
                (1, 1, cfg.block_q, cfg.block_k),
                lambda b, h, iq, ik=0, bb=bb, bh=bh: (
                    bb if bb is not None else b,
                    bh if bh is not None else h,
                    iq,
                    ik,
                ),
            )
        )
        args.append(bias)
    if cfg.has_alibi:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, iq, ik=0: (0, h, 0, 0))
        )
        args.append(alibi_slopes.reshape(1, heads, 1, 1))
    if cfg.has_dropout:
        in_specs.append(_seed_spec())
        args.append(seed.reshape(1, 1).astype(jnp.int32))

    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        # (B, H, Lp, 1): TPU-tileable residual without the 128-lane
        # replication the in-tree kernel pays for.
        jax.ShapeDtypeStruct((batch, heads, q_len_p, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, cfg.block_q, d), _qix),
        pl.BlockSpec((1, 1, cfg.block_q, 1), _qix),
    ]
    scratch_shapes = [] if single else [
        pltpu.VMEM((cfg.block_q, LANES), jnp.float32),  # running max m
        pltpu.VMEM((cfg.block_q, LANES), jnp.float32),  # running sum l
        pltpu.VMEM((cfg.block_q, d), jnp.float32),  # output accumulator
    ]

    o, lse = pl.pallas_call(
        kernel,
        grid=(batch, heads, nq) if single else (batch, heads, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel",) * 3 if single else
                ("parallel", "parallel", "parallel", "arbitrary")),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * q_len_p * kv_len_p * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=batch * heads * q_len_p * kv_len_p,
        ),
        interpret=cfg.interpret,
    )(*args)
    return o, lse


def _fwd_pipeline_kernel(cfg: FlashConfig, nk: int, d: int,
                         transposed: bool, *refs):
    """Forward with the KV sweep as an inner ``emit_pipeline``.

    The grid-path forward pays a Mosaic grid-step re-entry per KV block
    (measured dominant on v5e — CLAUDE.md auto-policy notes); here the outer
    grid is only (batch, heads, q_blocks) and KV tiles stream through a
    double-buffered inner pipeline. Causal runs a DYNAMIC inner grid bound:
    KV blocks wholly above the diagonal are never fetched nor computed —
    the single-block auto-policy config by contrast computes the full
    (L, S) score tile. Forward only; the backward keeps the grid path.

    ``transposed``: k/v arrive as (B, H, d, S) — used for d < 128, where
    the minor dim of a streamed window must be 128-aligned (S blocks are;
    d=64 is not). Also avoids the PV lane-pad that doubled MXU N-dim work.
    """
    (q_ref, k_ref, v_ref, b_ref, a_ref, seed_ref), rest = _parse_in_refs(
        cfg, refs)
    o_ref, lse_ref, m_scr, l_scr, acc_scr = rest

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)

    m_scr[...] = jnp.full_like(m_scr, 0.0 if cfg.n > 0 else NEG_INF)
    l_scr[...] = jnp.full_like(l_scr, float(cfg.n))
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    slope = a_ref[0, 0] if a_ref is not None else None

    if cfg.is_causal:
        # last KV block index any row of this q block can see; +1 => count.
        # Can be 0 (rectangular causal q_len > kv_len: a q block entirely
        # before the first key) — such blocks skip the pipeline below and
        # take the defined l == 0 epilogue (o = 0, lse = NEG_INF), exactly
        # like the grid path's invisible-block skip.
        q_max = iq * cfg.block_q + cfg.block_q - 1
        nk_vis = jnp.clip(
            (q_max + _causal_offset(cfg)) // cfg.block_k + 1, 0, nk)
    else:
        nk_vis = nk

    def inner(k_tile, v_tile):
        ik = pl.program_id(0)  # inner grid index (emit_pipeline grid_env)
        k = k_tile[0, 0]
        v = v_tile[0, 0]
        if transposed:
            # k (d, block_k): contract q's d against dim 0 directly
            s = jax.lax.dot_general(
                q, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = _mask_scores(cfg, s, slope, iq, ik)
        else:
            s = _scores(cfg, q, k, None, slope, iq, ik)
        m_prev = m_scr[...][:, :1]
        l_prev = l_scr[...][:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        if cfg.has_dropout:
            p = p * _dropout_mult(cfg, seed_ref[0, 0], ib, ih, iq, ik)
        if transposed:
            # v (d, block_k): contract p's key dim against v's dim 1
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv

    if transposed:
        kv_block = (1, 1, d, cfg.block_k)

        def kv_index(ik):
            return (ib, ih, 0, ik)
    else:
        kv_block = (1, 1, cfg.block_k, d)

        def kv_index(ik):
            return (ib, ih, ik, 0)

    pipeline = pltpu.emit_pipeline(
        inner,
        grid=(nk_vis,),
        in_specs=[pl.BlockSpec(kv_block, kv_index),
                  pl.BlockSpec(kv_block, kv_index)],
    )
    if cfg.is_causal and _causal_offset(cfg) < 0:
        # nk_vis can be 0 only when q_len > kv_len (static offset < 0)
        pl.when(nk_vis > 0)(lambda: pipeline(k_ref, v_ref))
    else:
        pipeline(k_ref, v_ref)

    o, lse = _finalize(cfg, m_scr[...], l_scr[...], acc_scr[...],
                       o_ref.dtype)
    o_ref[0, 0] = o
    lse_ref[0, 0] = lse[:, :1]


def _fwd_pipelined(cfg: FlashConfig, q, k, v, alibi_slopes, seed):
    """Inner-pipeline forward launch (no bias support — policy falls back)."""
    q = q * jnp.asarray(cfg.scale, q.dtype)
    batch, heads, q_len_p, d = q.shape
    kv_len_p = k.shape[2]
    nq = q_len_p // cfg.block_q
    nk = kv_len_p // cfg.block_k

    # emit_pipeline windows must be 128-aligned on the minor dim, which a
    # d < 128 head dim is not. Streaming k/v TRANSPOSED (B, H, d, S) makes
    # the minor dim an S block (always aligned) with no lane padding (a
    # 64->128 pad doubled the PV matmul's N-dim MXU work, measured -13%
    # at L4096/hd64); the in-kernel dots contract the transposed layout
    # directly. The one-time transpose is XLA's to fuse or materialize.
    transposed = d < 128
    if transposed:
        k = jnp.swapaxes(k, 2, 3)
        v = jnp.swapaxes(v, 2, 3)

    kernel = functools.partial(_fwd_pipeline_kernel, cfg, nk, d, transposed)

    in_specs = [
        pl.BlockSpec((1, 1, cfg.block_q, d), lambda b, h, iq: (b, h, iq, 0)),
        # k/v PINNED to HBM (ANY lets small arrays land whole in VMEM,
        # where the inner pipeline's d<128 window slice breaks tiling
        # alignment); tiles stream in via the inner pipeline's DMAs
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    args = [q, k, v]
    if cfg.has_alibi:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, iq: (0, h, 0, 0)))
        args.append(alibi_slopes.reshape(1, heads, 1, 1))
    if cfg.has_dropout:
        in_specs.append(_seed_spec())
        args.append(seed.reshape(1, 1).astype(jnp.int32))

    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, q_len_p, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, cfg.block_q, d), lambda b, h, iq: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, cfg.block_q, 1), lambda b, h, iq: (b, h, iq, 0)),
    ]
    scratch_shapes = [
        pltpu.VMEM((cfg.block_q, LANES), jnp.float32),
        pltpu.VMEM((cfg.block_q, LANES), jnp.float32),
        pltpu.VMEM((cfg.block_q, d), jnp.float32),
    ]

    o, lse = pl.pallas_call(
        kernel,
        grid=(batch, heads, nq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * q_len_p * kv_len_p * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=batch * heads * q_len_p * kv_len_p,
        ),
        interpret=cfg.interpret,
    )(*args)
    return o, lse


# ----------------------------------------------------------------------------
# Backward
# ----------------------------------------------------------------------------


def _bwd_dq_kernel(cfg: FlashConfig, num_q_blocks: int, num_kv_blocks: int,
                   *refs):
    (q_ref, k_ref, v_ref, b_ref, a_ref, seed_ref), rest = _parse_in_refs(
        cfg, refs)
    it = iter(rest)
    do_ref, lse_ref, dl_ref, dq_ref = next(it), next(it), next(it), next(it)
    dbias_ref = next(it) if cfg.grad_bias else None
    dslope_ref = next(it) if cfg.has_alibi else None
    dq_scr = next(it)
    dslope_scr = next(it) if cfg.has_alibi else None

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if cfg.has_alibi:
        # dslope accumulates over the WHOLE (iq, ik) sweep of one (b, h)
        @pl.when(jnp.logical_and(iq == 0, ik == 0))
        def _init_slope():
            dslope_scr[...] = jnp.zeros_like(dslope_scr)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        # clamp: the fully-masked-row sentinel lse == NEG_INF must yield
        # p = 0 (zero grads), not exp(NEG_INF - NEG_INF) = 1 (see DEAD_LSE)
        lse = jnp.maximum(lse_ref[0, 0], DEAD_LSE)  # (block_q, 1)
        delta = dl_ref[0, 0]  # (block_q, 1)
        bias = b_ref[0, 0] if b_ref is not None else None
        slope = a_ref[0, 0] if a_ref is not None else None

        s = _scores(cfg, q, k, bias, slope, iq, ik)
        # p are exactly the softmax-N probabilities: exp(s - log(n + sum exp)).
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if cfg.has_dropout:
            # d(attn weight) sees the kept/(1-r) multiplier; delta already
            # equals sum_i w_i * dmult_i * dp_i because o carries the mask
            dp = dp * _dropout_mult(cfg, seed_ref[0, 0], ib, ih, iq, ik)
        ds = p * (dp - delta)
        if cfg.grad_bias:
            # bias enters the scores additively AFTER the q-folded scale, so
            # dbias is exactly ds for this tile (zero in masked/padded
            # regions since p or dp-delta vanish there)
            dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)
        if cfg.has_alibi:
            # s += slope * -(|dist|)  =>  dslope += sum(ds * -|dist|)
            q_pos = iq * cfg.block_q + jax.lax.broadcasted_iota(
                jnp.int32, (cfg.block_q, cfg.block_k), 0)
            k_pos = ik * cfg.block_k + jax.lax.broadcasted_iota(
                jnp.int32, (cfg.block_q, cfg.block_k), 1)
            dist = (q_pos + _causal_offset(cfg) - k_pos).astype(jnp.float32)
            contrib = jnp.sum(ds * -jnp.abs(dist))
            dslope_scr[...] += jnp.full_like(dslope_scr, contrib)
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if cfg.is_causal:
        pl.when(_block_visible(cfg, iq, ik))(_body)
        if cfg.grad_bias:
            # skipped (fully-masked) tiles still own an output block
            @pl.when(jnp.logical_not(_block_visible(cfg, iq, ik)))
            def _zero_dbias():
                dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])
    else:
        _body()

    @pl.when(ik == num_kv_blocks - 1)
    def _epilogue():
        # scale applied once per q block (q fed to this kernel is pre-scaled,
        # which already accounts for dk; dq needs the explicit factor).
        dq_ref[0, 0] = (cfg.scale * dq_scr[...]).astype(dq_ref.dtype)

    if cfg.has_alibi:
        @pl.when(jnp.logical_and(iq == num_q_blocks - 1,
                                 ik == num_kv_blocks - 1))
        def _flush_slope():
            dslope_ref[0, 0] = dslope_scr[...]


def _bwd_dkv_kernel(cfg: FlashConfig, num_q_blocks: int, *refs):
    (q_ref, k_ref, v_ref, b_ref, a_ref, seed_ref), rest = _parse_in_refs(
        cfg, refs)
    do_ref, lse_ref, dl_ref, dk_ref, dv_ref, dk_scr, dv_scr = rest

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = jnp.maximum(lse_ref[0, 0], DEAD_LSE)  # (block_q, 1); see dq
        delta = dl_ref[0, 0]  # (block_q, 1)
        bias = b_ref[0, 0] if b_ref is not None else None
        slope = a_ref[0, 0] if a_ref is not None else None

        s = _scores(cfg, q, k, bias, slope, iq, ik)
        p = jnp.exp(s - lse)
        if cfg.has_dropout:
            # same mask as forward (regenerated from global coordinates);
            # dv sees the dropped weights, ds the masked dp
            dmult = _dropout_mult(cfg, seed_ref[0, 0], ib, ih, iq, ik)
            pd = p * dmult
        else:
            pd = p
        # dv += (dropped p)^T @ do
        dv_scr[...] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if cfg.has_dropout:
            dp = dp * dmult
        ds = p * (dp - delta)
        # dk += ds^T @ (scale * q) — q arrives pre-scaled, so no extra factor
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if cfg.is_causal:
        pl.when(_block_visible(cfg, iq, ik))(_body)
    else:
        _body()

    @pl.when(iq == num_q_blocks - 1)
    def _epilogue():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bias_spec(cfg: FlashConfig, bias, iq_of, ik_of):
    bb = 0 if bias.shape[0] == 1 else None
    bh = 0 if bias.shape[1] == 1 else None

    def index_map(b, h, i2, i3, bb=bb, bh=bh):
        return (
            bb if bb is not None else b,
            bh if bh is not None else h,
            iq_of(i2, i3),
            ik_of(i2, i3),
        )

    return pl.BlockSpec((1, 1, cfg.block_q, cfg.block_k), index_map)


def _bwd(cfg: FlashConfig, residuals, do):
    q, k, v, bias, alibi_slopes, seed, o, lse = residuals
    q = q * jnp.asarray(cfg.scale, q.dtype)  # same fold as forward
    batch, heads, q_len_p, d = q.shape
    kv_len_p = k.shape[2]
    nq = q_len_p // cfg.block_q
    nk = kv_len_p // cfg.block_k

    do = do.astype(q.dtype)
    # delta = rowsum(do * o) — cheap, fused by XLA; (B, H, Lp, 1)
    # (the reference runs a dedicated _bwd_preprocess kernel for this,
    # flash_attn_triton.py:130-143; XLA fuses it for free on TPU).
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )

    q_spec_q = pl.BlockSpec((1, 1, cfg.block_q, d), lambda b, h, iq, ik: (b, h, iq, 0))
    k_spec_q = pl.BlockSpec((1, 1, cfg.block_k, d), lambda b, h, iq, ik: (b, h, ik, 0))
    row_spec_q = pl.BlockSpec((1, 1, cfg.block_q, 1), lambda b, h, iq, ik: (b, h, iq, 0))

    # ---- dq (+ dbias, dslopes) ----
    in_specs = [q_spec_q, k_spec_q, k_spec_q]
    args = [q, k, v]
    if cfg.has_bias:
        in_specs.append(_bias_spec(cfg, bias, lambda iq, ik: iq, lambda iq, ik: ik))
        args.append(bias)
    if cfg.has_alibi:
        in_specs.append(pl.BlockSpec((1, 1, 1, 1), lambda b, h, iq, ik: (0, h, 0, 0)))
        args.append(alibi_slopes.reshape(1, heads, 1, 1))
    if cfg.has_dropout:
        in_specs.append(_seed_spec())
        args.append(seed.reshape(1, 1).astype(jnp.int32))
    in_specs += [q_spec_q, row_spec_q, row_spec_q]
    args += [do, lse, delta]

    out_specs = [q_spec_q]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if cfg.grad_bias:
        # per-(b, h) tiles in f32; reduced to the bias broadcast shape by
        # the caller (matches torch autograd, which also materializes the
        # full (B, H, L, S) cotangent before summing broadcast dims)
        out_specs.append(pl.BlockSpec((1, 1, cfg.block_q, cfg.block_k),
                                      lambda b, h, iq, ik: (b, h, iq, ik)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, heads, q_len_p, kv_len_p), jnp.float32))
    if cfg.has_alibi:
        # lane-replicated per-(b, h) partial; summed over b by the caller
        out_specs.append(pl.BlockSpec((1, 1, 1, LANES),
                                      lambda b, h, iq, ik: (b, h, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, heads, 1, LANES), jnp.float32))

    scratch_shapes = [pltpu.VMEM((cfg.block_q, d), jnp.float32)]
    if cfg.has_alibi:
        scratch_shapes.append(pltpu.VMEM((1, LANES), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, cfg, nq, nk),
        grid=(batch, heads, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel",
                # dslope accumulation spans the whole (iq, ik) sweep, so iq
                # must keep program order when slopes are differentiated
                "arbitrary" if cfg.has_alibi else "parallel",
                "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(*args)
    outs = list(outs) if isinstance(outs, (list, tuple)) else [outs]
    dq = outs.pop(0)
    dbias = outs.pop(0) if cfg.grad_bias else None
    dslopes = outs.pop(0)[:, :, 0, 0] if cfg.has_alibi else None

    # ---- dk, dv ---- (kv blocks outer, q blocks inner)
    q_spec_kv = pl.BlockSpec((1, 1, cfg.block_q, d), lambda b, h, ik, iq: (b, h, iq, 0))
    k_spec_kv = pl.BlockSpec((1, 1, cfg.block_k, d), lambda b, h, ik, iq: (b, h, ik, 0))
    row_spec_kv = pl.BlockSpec((1, 1, cfg.block_q, 1), lambda b, h, ik, iq: (b, h, iq, 0))

    in_specs = [q_spec_kv, k_spec_kv, k_spec_kv]
    args = [q, k, v]
    if cfg.has_bias:
        in_specs.append(_bias_spec(cfg, bias, lambda ik, iq: iq, lambda ik, iq: ik))
        args.append(bias)
    if cfg.has_alibi:
        in_specs.append(pl.BlockSpec((1, 1, 1, 1), lambda b, h, ik, iq: (0, h, 0, 0)))
        args.append(alibi_slopes.reshape(1, heads, 1, 1))
    if cfg.has_dropout:
        in_specs.append(_seed_spec())
        args.append(seed.reshape(1, 1).astype(jnp.int32))
    in_specs += [q_spec_kv, row_spec_kv, row_spec_kv]
    args += [do, lse, delta]

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, cfg, nq),
        grid=(batch, heads, nk, nq),
        in_specs=in_specs,
        out_specs=[k_spec_kv, k_spec_kv],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((cfg.block_k, d), jnp.float32),
            pltpu.VMEM((cfg.block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(*args)

    return dq, dk, dv, dbias, dslopes


# ----------------------------------------------------------------------------
# custom_vjp binding (replaces torch.autograd.Function,
# reference flash_attn_triton.py:241-336)
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(cfg: FlashConfig, q, k, v, bias, alibi_slopes, seed):
    return _fwd(cfg, q, k, v, bias, alibi_slopes, seed)


def _flash_fwd(cfg: FlashConfig, q, k, v, bias, alibi_slopes, seed):
    o, lse = _fwd(cfg, q, k, v, bias, alibi_slopes, seed)
    return (o, lse), (q, k, v, bias, alibi_slopes, seed, o, lse)


def _flash_bwd(cfg: FlashConfig, residuals, cotangents):
    do, _ = cotangents  # lse is a non-differentiable auxiliary output

    # The forward may run one large block (auto policy — grid overhead
    # wins there), but the backward materializes BOTH p and dp tiles, so
    # a 2048^2 block would need 2x the f32 score VMEM. Cap backward
    # blocks at 1024 whenever that still divides the padded lengths; the
    # dropout mask hashes absolute positions, so fwd/bwd block shapes may
    # differ freely.
    def _bwd_block(b: int, padded_len: int) -> int:
        c = min(b, 1024)
        return c if padded_len % c == 0 else b

    cfg = dataclasses.replace(
        cfg,
        block_q=_bwd_block(cfg.block_q, residuals[0].shape[2]),
        block_k=_bwd_block(cfg.block_k, residuals[1].shape[2]),
    )
    dq, dk, dv, dbias, dslopes = _bwd(cfg, residuals, do)
    bias = residuals[3]
    if dbias is not None and bias is not None:
        # reduce per-(b, h) tiles to the bias's broadcast shape (the same
        # sum torch autograd performs over expanded dims)
        if bias.shape[0] == 1:
            dbias = jnp.sum(dbias, axis=0, keepdims=True)
        if bias.shape[1] == 1:
            dbias = jnp.sum(dbias, axis=1, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    if dslopes is not None:
        dslopes = jnp.sum(dslopes, axis=0)  # (H,) f32
    return dq, dk, dv, dbias, dslopes, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_n_fused(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    *,
    softmax_n_param: float = 0.0,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    is_causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    bias_needs_grad: bool = True,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    return_residuals: bool = False,
) -> jax.Array:
    """Fused softmax-N flash attention on (B, H, L, E)/(B, H, S, E) inputs.

    Handles padding of L/S/E to block multiples internally (padded keys are
    masked in-kernel against the true ``kv_len``; padded queries/channels are
    sliced away — their zero cotangents make the backward exact).

    ``bias`` is an additive float bias broadcastable as (B|1, H|1, L, S);
    it is differentiable (the backward emits per-tile ds and reduces over
    broadcast dims — reference parity with autograd through the merged mask,
    core/flash_attn.py:87-124) unless ``bias_needs_grad=False``, which skips
    the O(B·H·L·S) cotangent materialization for non-learned masks.
    ``alibi_slopes`` is a per-head (H,) slope vector applied in-kernel, also
    differentiable.

    ``dropout_rate``/``dropout_seed``: in-kernel attention dropout (applied
    to the normalized weights, inverted scaling — reference
    core/functional.py:92 semantics). The mask is a deterministic hash of
    (seed, b, h, q_pos, k_pos) — see ``dropout_keep`` — so the backward
    regenerates it exactly; no (L, S) mask ever touches HBM.

    ``return_residuals=True`` additionally returns the softmax-N logsumexp
    ``lse = log(n + sum_j exp(s_j))`` of shape (B, H, L) — the associative-
    merge statistic ring attention carries across devices (SURVEY §2.3).
    """
    if query.ndim != 4 or key.ndim != 4 or value.ndim != 4:
        raise ValueError("flash_attention_n_fused expects (B, H, L, E) tensors")
    if key.shape[-1] != query.shape[-1]:
        raise ValueError("query/key head dims must match")
    if value.shape[-1] != key.shape[-1]:
        raise ValueError("fused kernel requires E == Ev (use the XLA path otherwise)")

    batch, heads, q_len, d = query.shape
    kv_len = key.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {dropout_rate}")
    seed = None
    if dropout_rate > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, jnp.int32)

    # causal STAIRCASE (round 4): the phase profile
    # (artifacts/prefill_phase_profile.json) shows the kernel at its DOT
    # floor — softmax/mask add ~nothing, and every causal tile-skipping
    # tiling LOSES to one big block (artifacts/prefill_causal_sweep.json)
    # because small per-tile dots can't sustain the floor rate. The one
    # remaining causal saving that keeps big dots: split q into P-row
    # pieces where piece i attends keys [0, P*(i+1)) as its own
    # SINGLE-BLOCK rectangular-causal call (piece offset == the
    # rectangular causal offset, so the phantom-key math is exact per
    # piece, and the VJP composes through the slice/concat). Work drops
    # to (nq+1)/(2nq) of the rectangle with every dot still (P, w)-sized.
    _stair = os.environ.get("FASN_CAUSAL_STAIRCASE", "1")
    if (_stair != "0" and block_q is None and block_k is None
            and is_causal and bias is None and alibi_slopes is None
            and dropout_rate == 0.0 and q_len == kv_len
            and os.environ.get("FASN_PREFILL_PIPELINE") != "force"
            and (not interpret or _stair == "force")):
        # wide mode (round 5): give each piece its WHOLE key span as a
        # single kv block, putting every piece on the one-pass kernel
        # (no online-softmax machinery) instead of a (P,1024)-block kv
        # grid. Fenced to spans <= 2048 and an 8MB f32 score tile.
        # Measured on v5e (artifacts/stair_sweep.json, round 5): at
        # B2/H16/L2048/hd128 wide P512 runs 0.760 ms vs 1.061 best
        # non-wide (1.40x, 16.4% -> 22.9% of the causal roofline); at
        # hd64 it is neutral (the auto cap already reaches 2048 there,
        # so pieces were single-block already). FASN_STAIR_WIDE=1
        # forces, 0 disables, auto (default) = d > 64.
        _wide = os.environ.get("FASN_STAIR_WIDE", "auto")
        d_ = query.shape[-1]
        wide_on = _wide == "1" or (_wide == "auto" and d_ > 64)
        # piece default: 512 in wide mode at L <= 2048 (best measured at
        # hd128: 0.760 vs 0.794 at P1024), 1024 otherwise (hd64 L4096:
        # P1024 5.18 ms vs P512 5.84; L4096 pieces past span 2048 cannot
        # be wide anyway)
        P = int(os.environ.get(
            "FASN_STAIR_P",
            "512" if wide_on and q_len <= 2048 else "1024"))
        if q_len % P == 0 and 2 <= q_len // P and q_len <= 4096:
            outs = []
            for i in range(q_len // P):
                w = P * (i + 1)
                blocks = {}
                if wide_on and w <= 2048 and P * w * 4 <= 8 * 2 ** 20:
                    blocks = dict(block_q=P, block_k=w)
                outs.append(flash_attention_n_fused(
                    query[:, :, P * i:P * (i + 1)], key[:, :, :w],
                    value[:, :, :w], softmax_n_param=softmax_n_param,
                    scale=scale, is_causal=True, interpret=interpret,
                    return_residuals=return_residuals, **blocks))
            if return_residuals:
                return (jnp.concatenate([o for o, _ in outs], axis=2),
                        jnp.concatenate([l for _, l in outs], axis=2))
            return jnp.concatenate(outs, axis=2)

    # block auto-policy (measured: results/recovery/sweep_prefill_v2.log).
    # Mosaic grid-step overhead dominates this kernel on v5e: a single
    # (L, S) block runs 1.5x faster than the best multi-block tiling at
    # (B2 H32 L2048 hd64) — 1.60ms vs 2.40ms, 89.8 TFLOPS dot ceiling —
    # and (1024, 1024) wins every multi-block case tried. Asymmetric
    # grids with a 2048-side fail to lower, so the single-block shape is
    # taken jointly or not at all. The 2048 cap needs the full f32 score
    # tile (16MB = all of VMEM); with a bias tile or dropout alongside it
    # the budget halves, so those fall back to 1024.
    inner_pipeline = False
    if block_q is None and block_k is None:
        qp_, kp_ = _round_up(q_len, 128), _round_up(kv_len, 128)
        # 2048 cap is CAUSAL-only since round 5: the (2048, 2048)
        # NON-causal single block started dying in the compile helper
        # (reproduced 4x on 2026-08-20, including with the round-4
        # kernel verbatim, while the causal block compiled in the same
        # window) — non-causal auto now takes the (1024, 1024) grid
        cap = 2048 if (d <= 64 and bias is None and is_causal
                       and dropout_rate == 0.0) else 1024
        if qp_ <= cap and kp_ <= cap:
            block_q, block_k = qp_, kp_
        else:
            block_q = block_k = 1024
            # long-sequence multi-block case: stream KV tiles through an
            # inner emit_pipeline instead of the kv grid dimension (no
            # bias tile support there; FASN_PREFILL_PIPELINE=0 reverts).
            # Measured (results/prefill_pipeline.json, v5e): wins 4-6% at
            # S >= 8k (causal blocks skipped at the DMA level); at
            # d >= 128 it wins from S >= 4096 (1.440 vs 1.464 ms) but
            # LOSES at S = 2048 (1.287 vs grid 1.196 —
            # artifacts/prefill_causal_sweep.json, r4); at S=4096/hd64 the
            # one-time k/v transpose outweighs it — gate on length/width.
            # TPU only: the interpreter cannot execute emit_pipeline.
            inner_pipeline = (bias is None and not interpret and
                              (kp_ >= 8192
                               or (d >= 128 and kp_ >= 4096)) and
                              os.environ.get("FASN_PREFILL_PIPELINE",
                                             "1") != "0")
    block_q = min(block_q or 1024, _round_up(q_len, 128))
    block_k = min(block_k or 1024, _round_up(kv_len, 128))
    if (bias is None and not interpret
            and os.environ.get("FASN_PREFILL_PIPELINE") == "force"):
        inner_pipeline = True  # experiment hook: pipeline at ANY block shape
        # a >=2048-wide pipeline window plus the f32 accumulators overflows
        # the 16MB scoped-vmem stack (measured: 20.29M at (1024, 2048) on
        # v5e) — clamp the KV window; the pipeline streams tiles anyway.
        # At block_q >= 2048 the crash fence below only admits the
        # pipeline with block_k <= 512, so clamp harder there instead of
        # raising on a config the clamp itself produced (ADVICE r4).
        block_k = min(block_k, 512 if block_q >= 2048 else 1024)
    q_len_p = _round_up(q_len, block_q)
    kv_len_p = _round_up(kv_len, block_k)
    # Fence the known Mosaic compile-helper crash class (first-party error
    # instead of an opaque 'HTTP 500: tpu_compile_helper subprocess exit
    # code 1'). Reproduced on v5e (artifacts/prefill_causal_sweep.json,
    # r3/r4): any MULTI-block grid with a 2048 side dies in the compile
    # helper, as does the inner pipeline at block_q>=2048 with
    # block_k>=1024 (pipeline with block_k<=512 and the single 2048x2048
    # block both compile and run). Auto policy never emits these; explicit
    # block args could.
    if not interpret and max(block_q, block_k) >= 2048:
        nq_t, nk_t = q_len_p // block_q, kv_len_p // block_k
        # single-block asymmetric (e.g. the chunked-prefill (256, 2048)
        # tile) compiles and runs; MULTI-block grids with a 2048 side
        # (and the pipeline at 2048x>=1024) crash, and since round 5 so
        # does the NON-causal (2048, 2048) single block (4x reproduced
        # 2026-08-20 incl. the r4 kernel verbatim; the causal one
        # compiles in the same window)
        bad = ((not inner_pipeline and (nq_t > 1 or nk_t > 1))
               or (inner_pipeline and block_q >= 2048 and block_k >= 1024)
               or (not is_causal and nq_t == 1 and nk_t == 1
                   and block_q >= 2048 and block_k >= 2048))
        if bad:
            raise ValueError(
                f"block config ({block_q}, {block_k}) over padded lens "
                f"({q_len_p}, {kv_len_p}) hits a known Mosaic "
                f"compile-helper crash on v5e (multi-block grids with a "
                f"2048 side; pipeline 2048x>=1024; non-causal 2048x2048 "
                f"single block — see "
                f"artifacts/prefill_causal_sweep.json). Use blocks "
                f"<= 1024, a causal single block covering the padded "
                f"lens, or the inner pipeline with block_k <= 512.")
    # head_dim: Pallas allows a last block dim equal to the (sub-128) array
    # dim, so common small head dims run UNPADDED — padding 64 -> 128 would
    # double every q/k/v DMA byte and materialize padded copies in HBM
    d_p = d if d in (32, 64) else _round_up(d, 128)

    cfg = FlashConfig(
        n=float(softmax_n_param),
        scale=float(scale),
        is_causal=bool(is_causal),
        q_len=q_len,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        has_bias=bias is not None,
        has_alibi=alibi_slopes is not None,
        dropout_rate=float(dropout_rate),
        grad_bias=bias is not None and bias_needs_grad,
        interpret=bool(interpret),
        inner_pipeline=inner_pipeline,
    )

    qp = jnp.pad(query, ((0, 0), (0, 0), (0, q_len_p - q_len), (0, d_p - d)))
    kp = jnp.pad(key, ((0, 0), (0, 0), (0, kv_len_p - kv_len), (0, d_p - d)))
    vp = jnp.pad(value, ((0, 0), (0, 0), (0, kv_len_p - kv_len), (0, d_p - d)))
    bp = None
    if bias is not None:
        if bias.ndim != 4:
            raise ValueError("bias must be 4-D (B|1, H|1, L, S)")
        bias = jnp.broadcast_to(
            bias, (bias.shape[0], bias.shape[1], q_len, kv_len)
        )
        bp = jnp.pad(
            bias,
            ((0, 0), (0, 0), (0, q_len_p - q_len), (0, kv_len_p - kv_len)),
        )
    slopes = None
    if alibi_slopes is not None:
        slopes = alibi_slopes.astype(jnp.float32).reshape(heads)

    out, lse = _flash(cfg, qp, kp, vp, bp, slopes, seed)
    out = out[:, :, :q_len, :d]
    if return_residuals:
        return out, lse[:, :, :q_len, 0]
    return out


def flash_attention_block_grads(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    dout: jax.Array,
    *,
    scale: Optional[float] = None,
    is_causal: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flash backward of ONE kv block against an EXTERNAL normalizer.

    The ring-attention building block (SURVEY §2.3): the ring's VJP
    recomputes per-block probabilities from the GLOBAL softmax-N logsumexp
    ``lse`` (p = exp(s - lse)) and needs per-block (dq, dk, dv) — the same
    tile math as the kernel's own backward, so this entry point reuses the
    two backward Pallas kernels with caller-supplied ``out``/``lse``
    instead of this block's own residuals. ``delta = rowsum(dout·out)`` is
    exact for softmax-N because the phantom ``+n`` key's value row is zero
    (reference parity: flash_attn_triton.py:130-143 computes the same
    delta in _bwd_preprocess).

    query (B, H, L, E); key/value (B, H, S, E); out/dout (B, H, L, E);
    lse (B, H, L) float32 — log(n + sum_j exp(s_j)) over the FULL (global)
    key range, not just this block. Returns (dq, dk, dv) in input dtypes.
    """
    batch, heads, q_len, d = query.shape
    kv_len = key.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_q = min(block_q, _round_up(q_len, 128))
    block_k = min(block_k, _round_up(kv_len, 128))
    q_len_p = _round_up(q_len, block_q)
    kv_len_p = _round_up(kv_len, block_k)
    d_p = d if d in (32, 64) else _round_up(d, 128)

    cfg = FlashConfig(
        n=0.0,  # n enters only through the caller's lse
        scale=float(scale),
        is_causal=bool(is_causal),
        q_len=q_len,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        interpret=bool(interpret),
    )

    pad_q = ((0, 0), (0, 0), (0, q_len_p - q_len), (0, d_p - d))
    pad_kv = ((0, 0), (0, 0), (0, kv_len_p - kv_len), (0, d_p - d))
    qp = jnp.pad(query, pad_q)
    kp = jnp.pad(key, pad_kv)
    vp = jnp.pad(value, pad_kv)
    op = jnp.pad(out, pad_q)
    dop = jnp.pad(dout, pad_q)
    # padded query rows: dout is 0 there, but p = exp(s - lse) must not
    # overflow into inf·0 — pad lse with a large POSITIVE value so p == 0
    lsep = jnp.pad(lse.astype(jnp.float32)[..., None],
                   ((0, 0), (0, 0), (0, q_len_p - q_len), (0, 0)),
                   constant_values=-NEG_INF)

    dq, dk, dv, _, _ = _bwd(cfg, (qp, kp, vp, None, None, None, op, lsep),
                            dop)
    return (dq[:, :, :q_len, :d], dk[:, :, :kv_len, :d],
            dv[:, :, :kv_len, :d])
