"""Where does prefill flash-attention time go? (VERDICT r4 item 4)

The causal sweep (artifacts/prefill_causal_sweep.json) shows tile-skipping
LOSES: computing 62% of the score rectangle in 512x512 pipeline tiles runs
1.4x SLOWER than one 2048x2048 block computing all of it — per-tile costs
dominate, so the question is what the single-block kernel actually spends
its 1.33 ms on. This profile times stripped-down single-block Pallas
kernels at the headline shape (B2 H32 L2048 hd64):

  dots_only     QK^T -> cast bf16 -> PV (no mask, no softmax) — the
                MXU + DMA floor (hd64 caps the MXU near 50%: a 64-deep
                contraction half-fills the 128-deep systolic array)
  exp_only      + exp(s) (no rowmax, no mask) — unsafe numerics, timing only
  softmax       + rowmax/subtract/sum (still no mask)
  full_nomask   the real kernel, is_causal=False (full softmax-n path)
  full_causal   the real kernel, is_causal=True (adds iota+cmp+select mask)

Usage: timeout 1200 python scripts/profile_prefill_phases.py
Writes artifacts/prefill_phase_profile.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts._timing import time_scan

# shape from env (round 5, VERDICT r4 item 3: the hd64 profile does not
# transfer to hd128 — profile both): FASN_PROF_SHAPE="B,H,L,HD"
_shape = _os.environ.get("FASN_PROF_SHAPE", "2,32,2048,64")
B, H, L, HD = (int(x) for x in _shape.split(","))


BQ = 512  # q-block: the (BQ, L) f32 score tile must fit scoped VMEM


def _mini_kernel(mode: str, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if mode == "dots_only":
        p = s
    elif mode == "exp_only":
        p = jnp.exp(s)
    elif mode == "softmax":
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p / l
    elif mode == "mask_softmax":
        iq = pl.program_id(2)
        q_pos = iq * BQ + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos <= q_pos, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p / l
    else:
        raise ValueError(mode)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def mini(mode, q, k, v):
    return pl.pallas_call(
        functools.partial(_mini_kernel, mode),
        grid=(B, H, L // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, HD), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, L, HD), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, HD), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, HD), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q, k, v)


def main():
    print("backend:", jax.default_backend(), flush=True)
    from flash_attention_softmax_n_tpu.kernels.flash_attention import (
        flash_attention_n_fused,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q, k, v = (0.3 * jax.random.normal(kk, (B, H, L, HD), jnp.bfloat16)
               for kk in ks)
    out = {"hw": "v5e-1", "shape": f"B{B} H{H} L{L} hd{HD} bf16",
           "rect_gflop": round(4 * B * H * L * L * HD / 1e9, 1)}

    def bench(name, fn):
        try:
            dt = time_scan(fn, q, k, v, reps=20)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return
        tf = 4 * B * H * L * L * HD / dt / 1e12
        out[name] = {"ms": round(dt * 1e3, 3), "tf_s": round(tf, 1)}
        print(f"{name}: {dt*1e3:.3f} ms = {tf:.1f} TF/s on the full rect",
              flush=True)

    for mode in ("dots_only", "exp_only", "softmax", "mask_softmax"):
        bench(mode, functools.partial(mini, mode))
    bench("full_nomask", lambda q, k, v: flash_attention_n_fused(
        q, k, v, softmax_n_param=1.0, is_causal=False))
    bench("full_causal", lambda q, k, v: flash_attention_n_fused(
        q, k, v, softmax_n_param=1.0, is_causal=True))

    _os.makedirs("artifacts", exist_ok=True)
    suffix = "" if (B, H, L, HD) == (2, 32, 2048, 64) else f"_hd{HD}"
    with open(f"artifacts/prefill_phase_profile{suffix}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
