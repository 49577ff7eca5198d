"""int8 matmul probe, round 2: localize the compute-bound dequant tax.

probe_int8_mm.py showed the xla_w route losing ~20-25% to dense bf16 at
M=512 on the compute-bound matmuls (w_gu). Three hypotheses:
  (a) XLA materializes the dequantized bf16 weight as a pre-pass
      (HBM round-trip: ~115MB for w_gu) -> time `dequant_only`;
  (b) the cast+scale fuses into the dot's operand load and slows the MXU
      inner loop -> tax should SHRINK as M grows (fixed per-weight-element
      cost amortized) -> time M=1024/2048;
  (c) a mixed-dtype dot (bf16 x int8) lets XLA convert in the dot pipeline
      -> `dot_mixed`.

Usage: timeout 1500 python scripts/probe_int8_mm2.py
Writes artifacts/int8_mm_probe2.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from scripts._timing import time_scan_dep

K, N = 2048, 11264  # the fused gate-up matmul — the compute-bound case


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    wf = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    wi = jnp.clip(jnp.round(wf / s), -128, 127).astype(jnp.int8)
    wb = (wi.astype(jnp.float32) * s).astype(jnp.bfloat16)

    out = {"hw": "v5e-1", "shape": f"K{K} N{N}"}

    # (a) the dequant alone (materialized bf16 weight)
    def dequant(w, s):
        return (w.astype(jnp.float32) * s).astype(jnp.bfloat16)
    dt = time_scan_dep(lambda w, s: dequant(w, s), wi, s, reps=30)
    out["dequant_only_us"] = round(dt * 1e6, 1)
    print(f"dequant_only: {dt*1e6:.0f} us "
          f"({(K*N*3)/dt/1e9:.0f} GB/s effective)", flush=True)

    for m in (512, 1024, 2048, 4096):
        x = jax.random.normal(key, (m, K), jnp.bfloat16) * 0.1
        flops = 2.0 * m * N * K
        row = {}

        def bench(name, fn, *args):
            try:
                dt = time_scan_dep(fn, x, *args, reps=20)
            except Exception as e:  # noqa: BLE001
                print(f"M={m} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                return
            row[name] = round(flops / dt / 1e12, 1)
            print(f"M={m} {name}: {dt*1e6:.0f} us = {row[name]} TF/s",
                  flush=True)

        bench("dense", lambda x, w: x @ w, wb)
        bench("xla_w", lambda x, w, s: x @ ((w.astype(jnp.float32) * s)
                                            .astype(x.dtype)), wi, s)
        bench("dot_mixed",
              lambda x, w, s: jax.lax.dot_general(
                  x, w, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32) * s, wi, s)
        out[f"M{m}"] = row

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/int8_mm_probe2.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
