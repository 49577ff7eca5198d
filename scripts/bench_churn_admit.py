"""churn192 with wider admission groups (FASN_ADMIT_G sweep).

Round-4: prewarm killed the churn variance (7712 +- 0.5%), leaving the
VERDICT target (>= 8000) ~4% away. The admission half of a warm wave runs
prefill at M = group x bucket; groups of 8 put the int8 matmuls at
M <= 1024 where the dequant tax still bites — groups of 16 reach the
M = 2048 regime the probe measured near the MXU ceiling.

Usage: timeout 1800 python scripts/bench_churn_admit.py
Writes artifacts/churn_admit_sweep.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)
    _cd = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "results", "jitcache")
    jax.config.update("jax_compilation_cache_dir", _cd)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench as benchmod
    benchmod.jax, benchmod.jnp = jax, jnp

    cfg, params = benchmod.build_model()
    from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
    qparams = quantize_decoder_weights(params, bits=8)
    del params

    out = {"hw": "v5e-1", "workload": "192 reqs 16-128 tok prompts / "
           "16-64 budgets, 192 slots"}
    for g in (8, 16, 32):
        _os.environ["FASN_ADMIT_G"] = str(g)
        try:
            mean, spread, _ = benchmod.bench_serving_churn(
                cfg, qparams, slots=192)
            out[f"admit_g{g}"] = {"tok_s": round(mean, 1),
                                  "spread_pct": round(spread, 1)}
            print(f"ADMIT_G={g}: {mean:.0f} tok/s (spread {spread:.1f}%)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            out[f"admit_g{g}"] = {"error": f"{type(e).__name__}: "
                                  f"{str(e)[:160]}"}
            print(f"ADMIT_G={g} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        finally:
            _os.environ.pop("FASN_ADMIT_G", None)

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/churn_admit_sweep.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
