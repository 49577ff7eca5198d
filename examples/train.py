"""Train a softmax-1 decoder with the sharded TP x DP (x SP) train step.

Demonstrates the parallel-training surface the reference lacks entirely
(SURVEY §2.3 — net-new capability): Megatron-sharded weights over 'model',
batch over 'data', and optionally ring-attention sequence parallelism over
'sp' for long contexts, all as ONE jitted step with XLA-inserted
collectives. Runs on a virtual CPU mesh for a smoke test:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train.py --cpu --sp
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--model-parallel", type=int, default=0,
                    help="TP degree (default: half the devices)")
    ap.add_argument("--sp", action="store_true",
                    help="add a 2-way sequence-parallel (ring attention) "
                         "axis")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flash_attention_softmax_n_tpu.models import (
        DecoderConfig,
        init_decoder_params,
    )
    from flash_attention_softmax_n_tpu.parallel import (
        make_mesh,
        make_train_step,
    )

    n = len(jax.devices())
    sp = 2 if args.sp else 1
    tp = args.model_parallel or max(1, n // (2 * sp))
    if tp * sp > n:
        ap.error(f"need at least {tp * sp} devices for model_parallel={tp}"
                 f"{' x sp=2' if args.sp else ''}, have {n} — on CPU set "
                 "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    dp = n // (tp * sp)
    axes = {"data": dp, "model": tp}
    if args.sp:
        axes["sp"] = sp
    mesh = make_mesh(axes)
    print(f"mesh: {axes} on {jax.default_backend()}")

    cfg = DecoderConfig(
        vocab_size=1024, d_model=256, n_layers=4, n_heads=8, n_kv_heads=8,
        d_ff=704, max_seq_len=args.seq, softmax_n=1.0,
        dtype=jnp.float32 if args.cpu else jnp.bfloat16,
        attn_implementation="xla" if args.cpu else "auto",
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    init, step = make_train_step(cfg, mesh, learning_rate=3e-4,
                                 sp_axis="sp" if args.sp else None)
    params, opt_state = init(params)

    rng = jax.random.PRNGKey(1)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        tokens = jax.random.randint(sub, (args.batch, args.seq), 0,
                                    cfg.vocab_size)
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, tokens)
        print(f"step {i}: loss={float(loss):.4f} "
              f"({time.time() - t0:.2f}s)")


if __name__ == "__main__":
    main()
