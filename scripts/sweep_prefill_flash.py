"""Prefill flash-attention-N kernel block sweep on the real TPU.

Round-2 VERDICT weak #3: the prefill kernel reports 8-12% of *nominal*
SOL (a bar the raw MXU probe itself caps at ~30% of on this chip) but
nobody swept block shapes. This measures the fused kernel across
(block_q, block_k) at the model geometries and reports ms + effective
TFLOPS, plus the raw-dot calibration so "% of achievable" is honest.

Usage: timeout 1500 python scripts/sweep_prefill_flash.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.kernels.flash_attention import (
    flash_attention_n_fused,
)


from scripts._timing import time_scan


def bench(fn, *args):
    # device-side scan loop: per-dispatch host loops measure the ~1.7ms
    # relay overhead, not the kernel (scripts/_timing.py)
    return time_scan(fn, *args, chain_arg=0, reps=10, outer=3)


def main():
    print("backend:", jax.default_backend(), flush=True)

    # raw MXU calibration at the attention dot shape
    m = jnp.zeros((4096, 4096), jnp.bfloat16)
    dt = bench(jax.jit(lambda a, b: a @ b), m, m)
    peak = 2 * 4096**3 / dt / 1e12
    print(f"raw bf16 4096^3 dot: {dt*1e3:.2f} ms = {peak:.1f} TFLOPS "
          f"(the achievable ceiling)", flush=True)

    for b, h, l, hd in [(2, 32, 2048, 64), (1, 8, 4096, 128),
                        (8, 32, 1024, 64)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (b, h, l, hd), jnp.bfloat16)
                   for kk in ks)
        flops = 4 * b * h * l * l * hd * 0.5  # causal halves the work
        best = (None, 1e9)
        for bq in (256, 512, 1024, 2048):
            for bk in (256, 512, 1024, 2048):
                if bq > l or bk > l:
                    continue
                try:
                    f = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                                flash_attention_n_fused(
                                    q, k, v, softmax_n_param=1.0,
                                    is_causal=True, block_q=bq, block_k=bk))
                    t = bench(f, q, k, v)
                except Exception as e:
                    print(f"  B{b} H{h} L{l} hd{hd} bq={bq} bk={bk}: "
                          f"FAIL {type(e).__name__}", flush=True)
                    continue
                tf = flops / t / 1e12
                mark = ""
                if t < best[1]:
                    best = ((bq, bk), t)
                    mark = "  <-- best"
                print(f"  B{b} H{h} L{l} hd{hd} bq={bq} bk={bk}: "
                      f"{t*1e3:.2f} ms = {tf:.1f} TFLOPS "
                      f"({tf/peak*100:.0f}% of achievable){mark}",
                      flush=True)
        print(f"  => best {best[0]} at {best[1]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
