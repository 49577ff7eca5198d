"""Pallas fused dequant-matmul: bf16 activations x INT8/INT4 weights.

The weight-only quantized matmul for decode: at generation time every weight
matrix is read from HBM once per token, so halving (int8) or quartering
(int4) the bytes moves the HBM-bandwidth bound directly. The dequant happens
*inside* the kernel on VMEM tiles (int -> bf16 cast, then MXU matmul with
f32 accumulation; per-output-channel scales applied in the epilogue —
mathematically exact because scales are constant along the contraction
axis).

This is the TPU counterpart of the north star's "INT4/INT8 weight-only
dequant fused into the matmul" (BASELINE.json) — capability the reference
does not have (its native-code surface is borrowed torch SDPA/Triton,
SURVEY §2.2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantized_matmul", "quantized_matmul_argmax"]


# per-kernel scoped-VMEM budget (v5e has 16MB scoped; leave headroom for
# Mosaic's own allocations). Shared by fused_mlp.py's tile picker.
VMEM_BUDGET = 11 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _balanced_block_n(n: int, cap: int) -> int:
    """Largest N tile <= cap that pads N to (nearly) nothing.

    A capped tile on a non-multiple N (lm_head 32000, fused gate-up 11264)
    zero-pads the WEIGHT — a fresh padded copy plus dead DMA columns on
    every decode step. Prefer an exact 128-multiple divisor of N when one
    exists within half of the cap; otherwise balance the tile count.
    """
    n128 = _round_up(n, 128)
    if n128 <= cap:
        return n128
    best_div = 0
    for mult in range(1, n128 // 128 + 1):
        bn = 128 * mult
        if bn > cap:
            break
        if n128 % bn == 0:
            best_div = bn
    balanced = min(n128, _round_up(_cdiv(n128, _cdiv(n128, cap)), 128))
    return best_div if best_div * 2 >= cap else balanced


def _qmm_kernel(bits: int, act_quant: bool, n_k_blocks: int,
                x_ref, xs_ref, w_ref, s_ref, o_ref, acc):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    w = w_ref[...]
    if bits == 4:
        # unpack nibbles along the contraction axis. Packing is grouped
        # (quant.qtensor.INT4_GROUP = 256 original rows -> 128 bytes), so a
        # tile covering whole groups unpacks locally: byte row i of group g
        # holds original rows (256g + i, 256g + 128 + i).
        bkp, bn = w.shape
        wg = w.reshape(bkp // 128, 128, bn)
        # Mosaic can't legalize shifts on 8-bit vectors ('arith.shli'
        # fails), so unpack in int32: byte -> unsigned, split nibbles,
        # sign-extend each back to [-8, 7]
        w32 = wg.astype(jnp.int32)  # 8-bit compares also fail to legalize
        u = jnp.where(w32 < 0, w32 + 256, w32)
        hi_u = u // 16
        lo_u = u - hi_u * 16
        lo = lo_u - 16 * (lo_u >= 8).astype(jnp.int32)
        hi = hi_u - 16 * (hi_u >= 8).astype(jnp.int32)
        w = jnp.concatenate([lo, hi], axis=1).reshape(bkp * 2, bn)
    if act_quant:
        # W8A8: both operands int8, MXU int32 accumulation — the cached
        # weights are NEVER cast (the int8->bf16 VPU cast is otherwise
        # ~as expensive as the weight DMA itself at decode batch sizes).
        # int4 weights were unpacked to int8-range int32 above; narrow.
        acc[...] += jax.lax.dot_general(
            x, w.astype(jnp.int8) if w.dtype != jnp.int8 else w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        wt = w.astype(x.dtype)
        acc[...] += jax.lax.dot_general(
            x, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == n_k_blocks - 1)
    def _epilogue():
        out = acc[...] * s_ref[...].astype(jnp.float32)
        if act_quant:
            out = out * xs_ref[...].astype(jnp.float32)  # (block_m, 1)
        o_ref[...] = out.astype(o_ref.dtype)


def _qmm_argmax_kernel(n_total: int, n_n_blocks: int, n_k_blocks: int,
                       block_n: int,
                       x_ref, w_ref, s_ref, idx_ref, val_ref,
                       acc, best_val, best_idx):
    jn = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == n_k_blocks - 1)
    def _tile_reduce():
        vals = acc[...] * s_ref[...].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        col = jn * block_n + lane
        # padded N columns must not win the argmax
        vals = jnp.where(col < n_total, vals, -jnp.inf)
        mx = jnp.max(vals, axis=1, keepdims=True)
        # first-index tie-break (matches XLA argmax): min lane among maxima
        local = jnp.min(jnp.where(vals == mx, lane, jnp.int32(2 ** 30)),
                        axis=1, keepdims=True)
        cand = jn * block_n + local

        @pl.when(jn == 0)
        def _first():
            best_val[...] = mx
            best_idx[...] = cand

        @pl.when(jn > 0)
        def _merge():
            take = mx > best_val[...]  # strict: earlier tile wins ties
            best_val[...] = jnp.where(take, mx, best_val[...])
            best_idx[...] = jnp.where(take, cand, best_idx[...])

        @pl.when(jn == n_n_blocks - 1)
        def _out():
            idx_ref[...] = best_idx[...]
            # the winning logit value rides along for free — a TP caller
            # needs it to merge argmaxes across vocab shards
            val_ref[...] = best_val[...]


def quantized_matmul_argmax(
    x: jax.Array,
    w_values: jax.Array,
    w_scales: jax.Array,
    *,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
    return_max: bool = False,
) -> jax.Array:
    """argmax_N(x (..., M, K) @ dequant(w) (K, N)) -> (..., M) int32.

    ``return_max=True`` additionally returns the winning logit values
    (..., M) f32 — the cross-shard merge key for tensor-parallel callers
    whose lm_head is vocab-sharded (each shard argmaxes its local columns,
    then the shard with the max value wins; engine._sharded_lm_head_argmax).

    The greedy-decode sampling epilogue fused into the int8 lm_head
    matmul: per N-tile row maxima and first-max indices merge in VMEM
    scratch across the (sequentialized) N grid, so the (M, vocab) logits
    are never written to HBM and XLA's slow variadic argmax reduce never
    runs. Matches ``argmax(quantized_matmul(..., out_dtype=f32))`` exactly
    when both use the same ``block_k`` (identical f32 accumulation order,
    same first-index tie-breaking); vs the engine's previous path — which
    round-tripped logits through bf16 before the argmax — this is strictly
    higher precision, so near-tie tokens can differ (for the better).

    Reference has no decode path (SURVEY §0); this serves the
    BASELINE.json engine's fused loop (engine_decode_loop greedy branch).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    lead = x.shape[:-2]
    m, k = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, k)
    m_total = x2.shape[0]
    kw, n = w_values.shape
    if kw != k:
        raise ValueError(f"contraction mismatch: x K={k}, w K={kw}")

    bm = min(256, _round_up(m_total, 8))
    cap = (VMEM_BUDGET // (2 * block_k + 6 * bm)) // 128 * 128
    block_n = _balanced_block_n(n, cap)
    block_k = min(block_k, _round_up(k, 128))

    mp = _round_up(m_total, bm)
    np_ = _round_up(n, block_n)
    kp = _round_up(k, block_k)
    xp = jnp.pad(x2, ((0, mp - m_total), (0, kp - k)))
    wp = jnp.pad(w_values, ((0, kp - k), (0, np_ - n)))
    sp = jnp.pad(w_scales.reshape(1, n), ((0, 0), (0, np_ - n)))

    grid = (mp // bm, np_ // block_n, kp // block_k)

    out, vals = pl.pallas_call(
        functools.partial(_qmm_argmax_kernel, n, grid[1], grid[2], block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, ik: (i, ik)),
            pl.BlockSpec((block_k, block_n), lambda i, j, ik: (ik, j)),
            pl.BlockSpec((1, block_n), lambda i, j, ik: (0, j)),
        ],
        out_specs=(pl.BlockSpec((bm, 1), lambda i, j, ik: (i, 0)),
                   pl.BlockSpec((bm, 1), lambda i, j, ik: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((mp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((mp, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=xp.size * 2 + wp.size + np_ * 4 + mp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, sp)

    out = out[:m_total, 0]
    out = out.reshape(*lead, m) if lead else out
    if not return_max:
        return out
    vals = vals[:m_total, 0]
    vals = vals.reshape(*lead, m) if lead else vals
    return out, vals


def quantized_matmul(
    x: jax.Array,
    w_values: jax.Array,
    w_scales: jax.Array,
    *,
    bits: int = 8,
    act_quant: bool = False,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x (..., M, K) @ dequant(w) (K, N) -> (..., M, N).

    ``w_values``: int8 (K, N), or int4 packed (K//2, N) with nibble pairs
    along K (quant.pack_int4 layout). ``w_scales``: (1, N) or (N,)
    per-output-channel scales.

    ``act_quant`` (W8A8): per-row symmetric int8 quantization of x, then
    int8 x int8 MXU with int32 accumulation and a rank-1 dequant epilogue
    (row scale x column scale). Exact per-tile factorization — the only
    error is the activation rounding itself (~0.3% relative), which the
    softmax-N outlier suppression exists to make safe (north star: "INT8/
    FP8 activation quantization"). Skips the in-kernel int8->bf16 weight
    cast, whose VPU cost rivals the weight DMA at decode batch sizes.

    int4 packing note: unpacking splits each byte into (lo, hi) nibbles that
    interleave as K-halves, so the packed weight must be produced by
    ``quantize(w, bits=4, axis=0)`` — the same layout this kernel unpacks.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype

    lead = x.shape[:-2]
    m, k = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, k) if lead else x.reshape(m, k)
    m_total = x2.shape[0]

    if act_quant:
        xf = x2.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        x2 = jnp.clip(jnp.round(xf / x_scales), -128, 127).astype(jnp.int8)
    else:
        x_scales = jnp.ones((m_total, 1), jnp.float32)
    kw = w_values.shape[0] * (2 if bits == 4 else 1)
    n = w_values.shape[1]
    if kw != k:
        raise ValueError(f"contraction mismatch: x K={k}, w K={kw}")
    if block_k is None:
        # wide-N decode matmuls (gate/up, lm_head) run ~15% faster with
        # deeper K tiles; N=2048-class prefer 512 (v5e sweep at M=256)
        block_k = 1024 if m_total <= 512 and n >= 4096 else 512
    if block_n is None:
        if m_total <= 512:
            # decode regime: the matmul is a pure weight-stream and grid
            # overhead (not MXU) bounds it — take the whole N per step so
            # each k-tile DMA is megabytes (measured best on v5e), capped
            # so the scoped-VMEM budget holds: double-buffered int8 weight
            # tiles (2*bk*bn) plus f32 acc + bf16 out (~6*bm*bn)
            bm = min(256, _round_up(m_total, 8))
            cap = (VMEM_BUDGET // (2 * block_k + 6 * bm)) // 128 * 128
            block_n = _balanced_block_n(n, cap)
        else:
            block_n = 512
    if bits == 4:
        if k % 256:
            raise ValueError("int4 fused matmul requires K % 256 == 0 "
                             "(grouped nibble packing)")
        block_k = max(256, block_k - block_k % 256)
    scales = w_scales.reshape(1, n)

    block_m = min(block_m, _round_up(m_total, 8))
    block_n = min(block_n, _round_up(n, 128))
    block_k = min(block_k, _round_up(k, 256 if bits == 4 else 128))
    mp = _round_up(m_total, block_m)
    np_ = _round_up(n, block_n)
    kp = _round_up(k, block_k)

    xp = jnp.pad(x2, ((0, mp - m_total), (0, kp - k)))
    xsp = jnp.pad(x_scales, ((0, mp - m_total), (0, 0)),
                  constant_values=1.0)
    wp = jnp.pad(
        w_values,
        ((0, (kp - k) // (2 if bits == 4 else 1)), (0, np_ - n)),
    )
    sp = jnp.pad(scales, ((0, 0), (0, np_ - n)))

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    wk_block = block_k // 2 if bits == 4 else block_k

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bits, act_quant, grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ik: (i, ik)),
            pl.BlockSpec((block_m, 1), lambda i, j, ik: (i, 0)),
            pl.BlockSpec((wk_block, block_n), lambda i, j, ik: (ik, j)),
            pl.BlockSpec((1, block_n), lambda i, j, ik: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ik: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=xp.size * 2 + wp.size + np_ * 4 + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xsp, wp, sp)

    out = out[:m_total, :n]
    return out.reshape(*lead, m, n) if lead else out
