"""Pallas fused SwiGLU MLP for decode: gate, up, and down matmuls in ONE kernel.

At decode batch sizes the MLP is a pure weight stream (HBM-bound), and the
down-projection contracts over the FF axis — which means the whole block

    y = silu(x @ Wg) * (x @ Wu) @ Wd

decomposes TILE-WISE over FF:  y = sum_j  silu(x @ Wg[:, j]) * (x @ Wu[:, j])
@ Wd[j, :].  No intermediate (B, d_ff) activation ever exists; one grid
streams all three weight matrices back-to-back with a single accumulator, so
the two separate matmul kernels' entry/pipeline-warmup bubbles (the measured
decode-matmul overhead on v5e, see CLAUDE.md) collapse into one.

Quantization: int8 weights dequantized per-tile. Gate/up scales are
per-output-channel (constant within a FF tile's columns) and must be applied
BEFORE the silu nonlinearity; the down scale is per-output-channel of y and
applies in the epilogue. Both are exact (scales constant along the relevant
contraction axis).

The reference has no MLP or decode path at all (SURVEY §0: ops + surgery +
analysis only); this kernel serves the BASELINE.json north-star decode
engine, counterpart of reference core/flash_attn_triton.py's role as the
owned fused-kernel layer (SURVEY §2.2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
    VMEM_BUDGET,
    _round_up,
)

__all__ = ["fused_mlp_matmul", "mlp_fusion_eligible"]


def _mlp_kernel(n_f_blocks: int,
                x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                o_ref, acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    g = jax.lax.dot_general(
        x, wg_ref[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sg_ref[...].astype(jnp.float32)
    u = jax.lax.dot_general(
        x, wu_ref[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * su_ref[...].astype(jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    acc[...] += jax.lax.dot_general(
        h, wd_ref[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_f_blocks - 1)
    def _epilogue():
        o_ref[...] = (acc[...] * sd_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype)


def _pick_block_f(f: int, budget_bytes: int, k: int, bm: int) -> Optional[int]:
    """Largest 128-multiple tile that divides F and fits the VMEM budget.

    Per grid step the kernel holds double-buffered int8 weight tiles
    wg (k, bf), wu (k, bf), wd (bf, k) => 6*k*bf bytes, plus per-bf-tile
    f32 g/u intermediates and the bf16 h (10*bm*bf), plus the fixed x
    (bm, k) bf16 and f32 accumulator (bm, k). Returns None when no
    dividing tile exists (caller falls back to separate matmuls — padding
    the weights would copy them every step, see quant_matmul's
    _balanced_block_n note).
    """
    fixed = 2 * bm * k + 4 * bm * k  # x + acc
    avail = budget_bytes - fixed
    if avail <= 0:
        return None
    cap = avail // (6 * k + 10 * bm)
    best = None
    for mult in range(1, f // 128 + 1):
        bf = 128 * mult
        if f % bf == 0 and bf <= cap:
            best = bf
    return best


def mlp_fusion_eligible(m_total: int, k: int, f: int, bits: int) -> bool:
    """Static predicate: can fused_mlp_matmul serve this shape?"""
    return (m_total <= 512 and bits == 8 and k % 128 == 0
            and _pick_block_f(f, VMEM_BUDGET, k,
                              min(256, _round_up(m_total, 8))) is not None)


def fused_mlp_matmul(
    x: jax.Array,
    wg_values: jax.Array, wg_scales: jax.Array,
    wu_values: jax.Array, wu_scales: jax.Array,
    wd_values: jax.Array, wd_scales: jax.Array,
    *,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """silu(x @ Wg) * (x @ Wu) @ Wd with int8 weights, one Pallas kernel.

    x (..., M, K) bf16; wg/wu int8 (K, F) with per-column scales; wd int8
    (F, K) with per-column scales. Returns (..., M, K).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype

    lead = x.shape[:-2]
    m, k = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, k)
    m_total = x2.shape[0]
    f = wg_values.shape[1]
    if wu_values.shape != (k, f) or wd_values.shape != (f, k):
        raise ValueError(
            f"shape mismatch: wg {wg_values.shape}, wu {wu_values.shape}, "
            f"wd {wd_values.shape}")

    bm = min(256, _round_up(m_total, 8))
    block_f = _pick_block_f(f, VMEM_BUDGET, k, bm)
    if block_f is None:
        raise ValueError(f"no dividing FF tile for f={f}, k={k}")

    mp = _round_up(m_total, bm)
    xp = jnp.pad(x2, ((0, mp - m_total), (0, 0)))
    sg = wg_scales.reshape(1, f)
    su = wu_scales.reshape(1, f)
    sd = wd_scales.reshape(1, k)

    grid = (mp // bm, f // block_f)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((k, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_f, k), lambda i, j: (j, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * f * 3,
            bytes_accessed=xp.size * 2 + 3 * k * f + mp * k * 2,
            transcendentals=mp * f,  # silu
        ),
        interpret=interpret,
    )(xp, wg_values, sg, wu_values, su, wd_values, sd)

    out = out[:m_total]
    return out.reshape(*lead, m, k) if lead else out
