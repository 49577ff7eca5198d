"""int8 weight-only matmul MXU efficiency at serving M (VERDICT r4 item 3).

The decode-step model (CLAUDE.md / scripts/profile_decode_step.py) puts the
int8 marginal at ~61 TF/s vs dense bf16's ~78 and a measured-achievable ~92:
the dequant-cast placement costs ~25% of the MXU at M >= 256. This probe
times every placement XLA and Pallas offer, per model matmul shape:

  dense     x_bf16 @ w_bf16                      (the ceiling)
  xla_w     x @ (cast(w_i8) * s)                 (current: qtensor.dequantize
                                                  — scale in f32 then cast)
  xla_wbf   x @ (cast(w_i8) * s_bf16)            (scale applied in bf16)
  xla_out   (x @ cast(w_i8)) * s                 (cast-only fused into the
                                                  dot; scale on the (M, N)
                                                  OUTPUT — K*N -> M*N
                                                  scale-multiplies)
  pallas    quantized_matmul (in-kernel tile dequant, auto blocks)
  pallas_bX quantized_matmul at explicit serving-tuned blocks

Usage: timeout 1500 python scripts/probe_int8_mm.py
Writes artifacts/int8_mm_probe.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

from scripts._timing import time_scan_dep

SHAPES = [  # (label, K, N) — TinyLlama-1.1B engine matmuls
    ("wq_2048x2048", 2048, 2048),
    ("w_gu_2048x11264", 2048, 11264),
    ("w_down_5632x2048", 5632, 2048),
    ("lm_head_2048x32000", 2048, 32000),
]
MS = [64, 256, 512]


def main():
    print("backend:", jax.default_backend(), flush=True)
    from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
        quantized_matmul,
    )

    out = {"hw": "v5e-1", "note": "TF/s per variant; 2*M*N*K flops"}
    key = jax.random.PRNGKey(0)
    for label, k, n in SHAPES:
        wf = jax.random.normal(key, (k, n), jnp.float32) * 0.02
        s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0  # (1, N)
        wi = jnp.clip(jnp.round(wf / s), -128, 127).astype(jnp.int8)
        wb = (wi.astype(jnp.float32) * s).astype(jnp.bfloat16)
        sbf = s.astype(jnp.bfloat16)
        for m in MS:
            x = jax.random.normal(key, (m, k), jnp.bfloat16) * 0.1
            flops = 2.0 * m * n * k
            row = {}

            def bench(name, fn, *args):
                try:
                    dt = time_scan_dep(fn, x, *args, reps=30)
                except Exception as e:  # noqa: BLE001 - probe resilience
                    print(f"{label} M={m} {name}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    return
                row[name] = round(flops / dt / 1e12, 1)
                print(f"{label} M={m} {name}: {dt*1e6:.0f} us "
                      f"= {row[name]} TF/s", flush=True)

            bench("dense", lambda x, w: x @ w, wb)
            bench("xla_w", lambda x, w, s: x @ ((w.astype(jnp.float32) * s)
                                                .astype(x.dtype)), wi, s)
            bench("xla_wbf", lambda x, w, s: x @ (w.astype(x.dtype) * s),
                  wi, sbf)
            bench("xla_out", lambda x, w, s: (x @ w.astype(x.dtype))
                  * s.astype(x.dtype), wi, sbf)
            bench("pallas_auto", lambda x, w, s: quantized_matmul(x, w, s),
                  wi, s)
            bench("pallas_m256_n512_k1024",
                  lambda x, w, s: quantized_matmul(
                      x, w, s, block_m=256, block_n=512, block_k=1024),
                  wi, s)
            bench("pallas_m256_n1024_k512",
                  lambda x, w, s: quantized_matmul(
                      x, w, s, block_m=256, block_n=1024, block_k=512),
                  wi, s)
            out[f"{label}_M{m}"] = row

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/int8_mm_probe.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
