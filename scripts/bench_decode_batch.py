"""Decode batch scaling: does b=768/1024 beat the b=512 headline?

probe_int8_mm2.py shows the int8 dequant tax on the compute-bound matmuls
vanishing by M=1024 (94 vs 95 TF/s dense), so bigger slot pools should
run the marginal decode nearer the MXU ceiling. HBM check at b=1024:
int8 weights 1.1 GB + int8 KV (22L x 1024 x 4kvh x 512 x 64 x 2) 5.9 GB
fits v5e-16GB. Measures bench.bench_decode (INT8 W + INT8 KV, 64-step
fused loop, attn_len bucketing) at b in {512, 768, 1024}.

Usage: timeout 1500 python scripts/bench_decode_batch.py
Writes artifacts/decode_batch_scaling.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)
    import bench as benchmod
    benchmod.jax, benchmod.jnp = jax, jnp

    cfg, params = benchmod.build_model()
    from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
    qparams = quantize_decoder_weights(params, bits=8)
    del params

    out = {"hw": "v5e-1", "quant": "int8 W + int8 KV, 64-step fused loop"}
    for batch in (768, 1024, 1152):
        try:
            tps = benchmod.bench_decode(cfg, qparams, kv_quantization="int8",
                                        batch=batch)
            out[f"tok_s_b{batch}"] = round(tps, 1)
            print(f"b={batch}: {tps:.1f} tok/s/chip", flush=True)
        except Exception as e:  # noqa: BLE001
            out[f"b{batch}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"b={batch} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    _os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/decode_batch_scaling.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
