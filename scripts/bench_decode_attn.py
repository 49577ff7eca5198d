"""Decode-attention microbench: Pallas kernel vs XLA route on the real TPU.

Round-2 VERDICT item: make the Pallas decode kernel win (>=1.2x XLA at
b in {32,256}, S in {512,2048}) so the engine can route to it and push
attn %SOL past 50. Run AFTER the hd-unpadded fix (the round-1 kernel
numbers were dominated by a full padded-cache copy per step).

Usage: timeout 1200 python scripts/bench_decode_attn.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.kernels.decode_attention import (
    decode_attention_n,
)
from flash_attention_softmax_n_tpu.quant.kv_cache import quantize_kv


from scripts._timing import time_scan


def bench(fn, *args):
    # device-side scan loop (scripts/_timing.py): the first version of
    # this bench used a per-dispatch host loop and measured a flat
    # 1.5-1.9ms "XLA time" at every shape — the relay dispatch floor,
    # not the kernel
    return time_scan(fn, *args, chain_arg=0, reps=50, outer=3)


def main():
    print("backend:", jax.default_backend(), flush=True)
    kvh, group, hd = 4, 8, 64  # TinyLlama GQA-8
    heads = kvh * group
    for b, s in [(32, 512), (32, 2048), (256, 512), (256, 2048)]:
        for frac in (0.25, 1.0):
            length = max(1, int(s * frac))
            ks = jax.random.split(jax.random.PRNGKey(0), 3)
            q = jax.random.normal(ks[0], (b, heads, hd), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, kvh, s, hd), jnp.bfloat16)
            v = jax.random.normal(ks[2], (b, kvh, s, hd), jnp.bfloat16)
            kq, kqs = quantize_kv(k, 8)
            vq, vqs = quantize_kv(v, 8)
            lengths = jnp.full((b,), length, jnp.int32)

            rows = {}
            for name, impl, i8 in [("xla", "xla", None),
                                   ("pallas-bf16", "pallas", False),
                                   ("pallas-int8", "pallas", True)]:
                f = jax.jit(lambda q, kv, ks_, vv, vs, ln, impl=impl, i8=i8:
                            decode_attention_n(
                                q, kv, vv, ln, k_scales=ks_, v_scales=vs,
                                softmax_n_param=1.0, implementation=impl,
                                int8_compute=i8))
                try:
                    dt = bench(f, q, kq, kqs, vq, vqs, lengths)
                    rows[name] = dt
                except Exception as e:
                    rows[name] = None
                    print(f"  {name} FAILED: {type(e).__name__}: {e}",
                          flush=True)
            # streaming SOL: int8 k+v valid rows only
            bytes_valid = b * kvh * length * hd * 2 * 1
            sol_ms = bytes_valid / 614e9 * 1e3
            msg = " ".join(f"{n}={dt*1e3:.2f}ms" if dt else f"{n}=FAIL"
                           for n, dt in rows.items())
            best = min((dt for dt in rows.values() if dt), default=None)
            pct = f"{sol_ms / (best * 1e3) * 100:.0f}%" if best else "-"
            print(f"b={b} S={s} len={length}: {msg}  "
                  f"(valid-rows SOL {sol_ms:.2f}ms, best={pct})", flush=True)


if __name__ == "__main__":
    main()
