"""The reference's two headline workflows, TPU-style, in one script:

1. SURGERY (reference README.md:170-176): take a pretrained HF BERT, rewrite
   it to softmax-1 attention. Here that's a checkpoint conversion plus a
   config rewrite (no monkey-patching) — and a parity check against HF.
2. ANALYSIS (reference README.md:147-159): stream activation statistics
   (kurtosis/skewness/variance/mean) through the model and write the
   reference-compatible JSON report, then run the quantization gates.

With --model it loads a HF checkpoint (e.g. prajjwal1/bert-tiny); without,
it builds a random bert-tiny locally so the example runs offline.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _local_tiny_bert():
    import transformers

    cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=512,
        max_position_embeddings=512)
    model = transformers.BertModel(cfg)
    model.eval()
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="HF checkpoint name/path; omit for a local random "
                         "bert-tiny (offline)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--softmax-n", type=float, default=1.0)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from transformers import AutoModel

    from flash_attention_softmax_n_tpu.analysis import (
        activation_stats_to_dict,
        compute_weight_statistics,
        register_activation_hooks,
        save_results,
    )
    from flash_attention_softmax_n_tpu.models import bert_forward
    from flash_attention_softmax_n_tpu.quant import gate_report
    from flash_attention_softmax_n_tpu.surgery import from_pretrained_hf

    if args.model:
        print(f"loading {args.model} ...")
        hf = AutoModel.from_pretrained(args.model)
    else:
        print("building local random bert-tiny (offline mode)")
        hf = _local_tiny_bert()

    # --- surgery: softmax_0 -> softmax_n as a checkpoint rewrite ---------
    cfg, params = from_pretrained_hf(hf, softmax_n_param=args.softmax_n)
    print(f"surgery applied: {cfg.n_layers} layers, softmax_n={cfg.softmax_n}")

    ids = jnp.asarray([[101, 7592, 2088, 102, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)

    # --- analysis: streaming activation stats + weight stats -------------
    layer_names = [f"layers.{i}.attention.output" for i in range(cfg.n_layers)]
    hooked, stats = register_activation_hooks(
        lambda toks, m: bert_forward(params, cfg, toks, attention_mask=m,
                                     collect_taps=True),
        layer_names=layer_names)
    _, stats = hooked(stats, ids, mask)
    act = activation_stats_to_dict(stats)
    weights = compute_weight_statistics(params)
    report = gate_report(act)
    print("activation kurtosis per layer:",
          {k: round(v["kurtosis"], 2) for k, v in act.items()})
    print("quantization gates:", report)
    save_results({"activations": act, "weights": weights}, "bert_softmax_n")
    print("wrote ./results/bert_softmax_n.json")


if __name__ == "__main__":
    main()
