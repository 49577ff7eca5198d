"""Standalone churn bench: the bench.py serving-churn workload only.

Iterating on the scheduler shouldn't cost a full bench.py run (headline +
dense + SOL sections, ~15 min). Same workload definition as
bench.bench_serving_churn: 192 requests/wave, prompts 16-128, budgets
16-64, greedy; best of two warm waves after a compile + settle wave.

Usage: timeout 1500 python scripts/bench_churn.py [slots ...]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    from flash_attention_softmax_n_tpu.engine import InferenceEngine
    from flash_attention_softmax_n_tpu.models import (
        DecoderConfig,
        init_decoder_params,
    )
    from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights

    cfg = DecoderConfig(
        vocab_size=32000, d_model=2048, n_layers=22, n_heads=32,
        n_kv_heads=4, d_ff=5632, max_seq_len=2048, softmax_n=1.0,
        dtype=jnp.bfloat16)
    params = quantize_decoder_weights(
        init_decoder_params(cfg, jax.random.PRNGKey(0)), bits=8)

    slot_list = [int(a) for a in _sys.argv[1:]] or [64, 128]
    for slots in slot_list:
        eng = InferenceEngine(cfg, params, max_batch=slots, max_len=512,
                              kv_quantization="int8")

        def wave(n=192):
            # identical stream each wave (see bench.bench_serving_churn)
            rng = np.random.RandomState(0)
            for _ in range(n):
                plen = int(rng.randint(16, 128))
                budget = int(rng.randint(16, 64))
                eng.submit(
                    rng.randint(0, cfg.vocab_size, size=plen).tolist(),
                    max_new_tokens=budget)
            t0 = time.time()
            done = eng.run_until_done(loop_steps=64)
            return sum(len(r.output) for r in done), time.time() - t0

        t, d = wave()
        print(f"slots={slots}: compile wave {t/d:.0f} tok/s", flush=True)
        wave()  # settle
        eng.profile_report()
        eng.counters_report()
        rates = []
        for _ in range(2):
            t, d = wave()
            rates.append(t / d)
        print(f"slots={slots}: {max(rates):.0f} tok/s warm "
              f"(waves {[f'{r:.0f}' for r in rates]})", flush=True)
        for phase, row in eng.profile_report().items():
            print(f"  {phase:15s}: {row['total_s']:7.3f}s {row['count']:4d}x "
                  f"{row['mean_ms']:7.2f} ms/ea", flush=True)
        print(f"  counters: {eng.counters_report()}", flush=True)
        del eng


if __name__ == "__main__":
    main()
