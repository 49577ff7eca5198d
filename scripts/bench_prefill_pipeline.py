"""Inner-pipeline vs grid-path prefill flash kernel on the real TPU.

Round-3 lever (CLAUDE.md): "multi-block pipelining to recover the
grid-overhead loss at L>=4096". The inner emit_pipeline forward drops the
kv grid dimension (one Mosaic grid step per (b, h, iq)) and skips
causally-invisible KV blocks via a dynamic inner bound — the single-block
policy config by contrast computes the full (L, S) score tile.

Measures causal forward at serving geometries, grid path vs pipeline path
(and the single-block config where it applies), device-timed via
scripts/_timing.time_scan. Usage: timeout 1500 python scripts/bench_prefill_pipeline.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os

import jax
import jax.numpy as jnp

from scripts._timing import time_scan


def run_case(b, h, l, hd, *, reps=10):
    from flash_attention_softmax_n_tpu.kernels.flash_attention import (
        flash_attention_n_fused,
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (0.3 * jax.random.normal(kk, (b, h, l, hd), jnp.bfloat16)
               for kk in ks)
    flops = 4 * b * h * l * l * hd * 0.5  # causal visible half

    def fused(q):
        return flash_attention_n_fused(
            q, k, v, softmax_n_param=1.0, is_causal=True)

    rows = {}
    variants = [("auto", None, {})]
    if l > 2048:
        variants.append(("grid-1024", "0", {}))
        variants.append(("pipe-bq2048", "force",
                         {"block_q": 2048, "block_k": 1024}))
        variants.append(("pipe-bk512", "force",
                         {"block_q": 1024, "block_k": 512}))
    else:
        variants.append(("pipe-1024", "force", {}))

    for name, env, kw in variants:
        if env is None:
            os.environ.pop("FASN_PREFILL_PIPELINE", None)
        else:
            os.environ["FASN_PREFILL_PIPELINE"] = env

        def f(q, kw=kw):
            return flash_attention_n_fused(
                q, k, v, softmax_n_param=1.0, is_causal=True, **kw)

        try:
            dt = time_scan(f, q, chain_arg=0, reps=reps, outer=3)
        except Exception as e:  # Mosaic may reject exotic block combos
            print(f"  {name:12s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        tf = flops / dt / 1e12
        rows[name] = {"ms": round(dt * 1e3, 3), "tflops": round(tf, 1)}
        print(f"  {name:12s}: {dt*1e3:7.3f} ms  {tf:6.1f} TF/s (causal)",
              flush=True)
    os.environ.pop("FASN_PREFILL_PIPELINE", None)
    return rows


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    for b, h, l, hd in [(2, 32, 2048, 64), (2, 32, 4096, 64),
                        (1, 32, 8192, 64), (1, 8, 16384, 64),
                        (1, 8, 4096, 128)]:
        print(f"B{b} H{h} L{l} hd{hd}:", flush=True)
        out[f"b{b}_h{h}_l{l}_hd{hd}"] = run_case(b, h, l, hd)
    os.makedirs("results", exist_ok=True)
    with open("results/prefill_pipeline.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
