"""Causal-staircase sweep: piece size P vs the single-block baseline.

The staircase (kernels/flash_attention.py, round 4) splits causal
self-attention into P-row q pieces, each a single-block rectangular call:
work drops to (nq+1)/(2nq) of the rectangle while every dot stays big
(the phase profile shows the kernel is dot-floor-bound at ~52 TF/s for
hd64). Also times the hd128 mini dot floor and the fwd+bwd step.

Usage: timeout 1500 python scripts/sweep_stair.py
Writes artifacts/stair_sweep.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from scripts._timing import time_scan

CONFIGS = [
    ("B2_H32_L2048_hd64", 2, 32, 2048, 64),
    ("B2_H16_L2048_hd128", 2, 16, 2048, 128),
    ("B2_H32_L4096_hd64", 2, 32, 4096, 64),
]


def main():
    print("backend:", jax.default_backend(), flush=True)
    from flash_attention_softmax_n_tpu.kernels.flash_attention import (
        flash_attention_n_fused,
    )
    from flash_attention_softmax_n_tpu.utils.profiling import (
        attention_roofline,
    )

    out = {"hw": "v5e-1",
           "note": "fwd ms causal n=1 bf16; sol vs 197TF causal roofline"}
    key = jax.random.PRNGKey(0)
    for label, B, H, L, hd in CONFIGS:
        ks = jax.random.split(key, 3)
        q, k, v = (0.3 * jax.random.normal(kk, (B, H, L, hd), jnp.bfloat16)
                   for kk in ks)
        rf = attention_roofline(B, H, L, L, hd, causal=True, dtype_bytes=2)
        row = {}

        def fn(q, k, v):
            return flash_attention_n_fused(
                q, k, v, softmax_n_param=1.0, is_causal=True)

        def bench(name, env):
            for kk, vv in env.items():
                _os.environ[kk] = vv
            try:
                dt = time_scan(fn, q, k, v, reps=20)
            except Exception as e:  # noqa: BLE001
                print(f"{label} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                return
            finally:
                for kk in env:
                    _os.environ.pop(kk, None)
            pct = 100.0 * rf["sol_time"] / dt
            row[name] = {"ms": round(dt * 1e3, 3), "sol_pct": round(pct, 1)}
            print(f"{label} {name}: {dt*1e3:.3f} ms ({pct:.1f}% SOL)",
                  flush=True)

        bench("nostair", {"FASN_CAUSAL_STAIRCASE": "0"})
        for p in (256, 512, 1024, 2048):
            if L // p >= 2:
                bench(f"stair_P{p}", {"FASN_STAIR_P": str(p)})
                # round 5: wide mode — every piece a single-kv-block
                # ONE-PASS call (no online-softmax machinery)
                bench(f"stair_P{p}_wide", {"FASN_STAIR_P": str(p),
                                           "FASN_STAIR_WIDE": "1"})

        # fwd+bwd at the best-expected P (training step cost)
        def fb(q, k, v):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            return jax.grad(loss, 0)(q, k, v)

        for name, env in (("fwdbwd_nostair", {"FASN_CAUSAL_STAIRCASE": "0"}),
                          ("fwdbwd_P1024", {"FASN_STAIR_P": "1024"})):
            for kk, vv in env.items():
                _os.environ[kk] = vv
            try:
                dt = time_scan(fb, q, k, v, reps=10)
                row[name] = {"ms": round(dt * 1e3, 3)}
                print(f"{label} {name}: {dt*1e3:.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{label} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
            finally:
                for kk in env:
                    _os.environ.pop(kk, None)
        out[label] = row

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/stair_sweep.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
