"""Surgery -> fine-tune: the reference's composer workflow, TPU-style.

The reference's headline training story (README.md:170-176 + the composer
``AttentionSoftmaxN`` Algorithm): take a pretrained model, rewrite its
attention to softmax-N, then FINE-TUNE it — the patched modules keep their
``nn.Dropout`` live for exactly this (reference surgery/_bert.py:102,
_xlnet.py:63). Here the same loop runs as:

  1. surgery as a checkpoint rewrite: convert an HF Llama-style model and
     set softmax_n=1 in the config (surgery/convert.py) — no monkey-patching;
  2. fine-tune with the sharded TP x DP train step in TRAINING MODE:
     ``cfg.attn_dropout`` rides the in-kernel hash dropout on the Pallas
     path (kernels/flash_attention.py dropout_keep) and a fresh PRNGKey is
     folded per step;
  3. verify eval-mode generation still works on the tuned weights.

Offline by default (random-init tiny HF model). Smoke test on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/finetune_surgery.py --cpu --steps 2
"""

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--dropout", type=float, default=0.1)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import transformers

    from flash_attention_softmax_n_tpu.models import greedy_generate
    from flash_attention_softmax_n_tpu.parallel import (
        make_mesh,
        make_train_step,
    )
    from flash_attention_softmax_n_tpu.surgery import from_pretrained_hf

    # --- 1. "pretrained" model + surgery (checkpoint rewrite, n=1) ---
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=args.seq)
    hf_model = transformers.LlamaForCausalLM(hf_cfg)
    cfg, params = from_pretrained_hf(hf_model, softmax_n_param=1.0)
    cfg = dataclasses.replace(cfg, attn_dropout=args.dropout,
                              dtype=jnp.float32)
    print(f"surgery: softmax_n={cfg.softmax_n}, "
          f"fine-tune dropout={cfg.attn_dropout}")

    # --- 2. fine-tune, training mode, TP x DP mesh ---
    n = len(jax.devices())
    tp = max(1, n // 2)
    mesh = make_mesh({"data": n // tp, "model": tp})
    init, step = make_train_step(cfg, mesh, learning_rate=3e-4)
    params, opt_state = init(params)

    rng = np.random.RandomState(0)
    base_key = jax.random.PRNGKey(42)
    t0 = time.time()
    for i in range(args.steps):
        tokens = jnp.asarray(
            rng.randint(0, 255, size=(args.batch, args.seq)), jnp.int32)
        params, opt_state, loss = step(
            params, opt_state, tokens,
            dropout_rng=jax.random.fold_in(base_key, i))
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:3d} loss {float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)")

    # --- 3. eval-mode generation on the tuned weights ---
    prompt = jnp.asarray([[1, 17, 42, 9]], jnp.int32)
    out = greedy_generate(params, cfg, prompt, max_new_tokens=8)
    print("generated:", np.asarray(out)[0].tolist())
    print("OK")


if __name__ == "__main__":
    main()
