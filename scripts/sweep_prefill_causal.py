"""Prefill causal over-compute sweep (VERDICT r4 item 4).

The single-block auto policy computes the full L x S score rectangle on
causal shapes (~2x the needed MXU work) yet still beat every multi-block
GRID tiling on v5e (grid-step overhead + skipped blocks still DMA their KV
tiles). The inner emit_pipeline pays grid re-entry once per q block and
skips causally-invisible KV tiles at the DMA level, so q-blocked pipeline
configs can actually cash in the causal savings. This sweep times, at the
bench headline shapes (B2 H32 L2048 hd64 and B2 H16 L2048 hd128, causal,
n=1, bf16):

  auto          the current policy (single 2048 block at hd64)
  grid_BQxBK    multi-block grid path
  pipe_BQxBK    inner-pipeline path (FASN_PREFILL_PIPELINE=force)

Usage: timeout 1500 python scripts/sweep_prefill_causal.py
Writes artifacts/prefill_causal_sweep.json.
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
BLOCKS = [(256, 256), (512, 256), (512, 512), (1024, 256), (1024, 512),
          (1024, 1024), (2048, 512), (2048, 1024)]


def main():
    print("backend:", jax.default_backend(), flush=True)
    from flash_attention_softmax_n_tpu.kernels.flash_attention import (
        flash_attention_n_fused,
    )
    from flash_attention_softmax_n_tpu.utils.profiling import (
        attention_roofline,
    )

    out = {"hw": "v5e-1", "note": "ms fwd, causal n=1 bf16; "
           "sol_pct vs 197 TF/s causal-flops roofline"}
    key = jax.random.PRNGKey(0)
    for label, B, H, L, hd in CONFIGS:
        ks = jax.random.split(key, 3)
        q, k, v = (0.3 * jax.random.normal(kk, (B, H, L, hd), jnp.bfloat16)
                   for kk in ks)
        rf = attention_roofline(B, H, L, L, hd, causal=True, dtype_bytes=2)
        row = {}

        def bench(name, bq, bk, force_pipe):
            _os.environ["FASN_PREFILL_PIPELINE"] = (
                "force" if force_pipe else "0")
            try:
                def fn(q, k, v):
                    return flash_attention_n_fused(
                        q, k, v, softmax_n_param=1.0, is_causal=True,
                        block_q=bq, block_k=bk)
                dt = time_scan(fn, q, k, v, reps=20)
            except Exception as e:  # noqa: BLE001 - sweep resilience
                print(f"{label} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                return None
            finally:
                _os.environ.pop("FASN_PREFILL_PIPELINE", None)
            pct = 100.0 * rf["sol_time"] / dt
            row[name] = {"ms": round(dt * 1e3, 3),
                         "sol_pct": round(pct, 1)}
            print(f"{label} {name}: {dt*1e3:.3f} ms ({pct:.1f}% SOL)",
                  flush=True)
            return dt

        # the current auto policy (no explicit blocks, default env)
        def fn_auto(q, k, v):
            return flash_attention_n_fused(
                q, k, v, softmax_n_param=1.0, is_causal=True)
        dt = time_scan(fn_auto, q, k, v, reps=20)
        row["auto"] = {"ms": round(dt * 1e3, 3),
                       "sol_pct": round(100.0 * rf["sol_time"] / dt, 1)}
        print(f"{label} auto: {dt*1e3:.3f} ms "
              f"({row['auto']['sol_pct']}% SOL)", flush=True)

        for bq, bk in BLOCKS:
            if bq > L or bk > L:
                continue
            if (bq, bk) != (1024, 1024) or L > 2048:
                bench(f"pipe_{bq}x{bk}", bq, bk, True)
        # two grid-path references (multi-block, KV inner grid dim)
        bench("grid_1024x1024", 1024, 1024, False)
        bench("grid_512x512", 512, 512, False)
        out[label] = row

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/prefill_causal_sweep.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
