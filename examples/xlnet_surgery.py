"""XLNet softmax-N surgery: the reference's second migration story.

The reference patches a live HF ``XLNetModel``'s ``rel_attn_core``
(surgery/surgery_functions/_xlnet.py); here the same outcome is a pure
checkpoint rewrite: convert the HF weights once, set ``softmax_n`` in the
config, run the first-party two-stream model (models/xlnet.py). Offline by
default (random tiny XLNet); pass --model for a real checkpoint, e.g.
hf-internal-testing/tiny-random-XLNetModel.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _local_tiny_xlnet():
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.XLNetConfig(
        vocab_size=128, d_model=32, n_layer=2, n_head=4, d_inner=64,
        dropout=0.0)
    model = transformers.XLNetModel(cfg)
    model.eval()
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="HF checkpoint name; default builds a random tiny "
                         "XLNet (offline)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=float, default=1.0, help="softmax_n")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flash_attention_softmax_n_tpu.models.xlnet import xlnet_forward
    from flash_attention_softmax_n_tpu.surgery import from_pretrained_hf

    if args.model:
        import transformers
        hf = transformers.XLNetModel.from_pretrained(args.model)
        hf.eval()
    else:
        print("building local random tiny XLNet (offline mode)")
        hf = _local_tiny_xlnet()

    # surgery = checkpoint rewrite: convert once, set n in the config
    cfg0, params = from_pretrained_hf(hf, softmax_n_param=0.0)
    cfg1, _ = from_pretrained_hf(hf, softmax_n_param=args.n)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, hf.config.vocab_size, size=(1, 12)),
                      jnp.int32)
    out0 = xlnet_forward(params, cfg0, ids)["last_hidden_state"]
    out1 = xlnet_forward(params, cfg1, ids)["last_hidden_state"]

    # the reference's test invariant: n=0 is HF-identical, n>0 changes
    import torch
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(np.asarray(ids),
                                           dtype=torch.long))
    err0 = float(jnp.max(jnp.abs(
        out0 - jnp.asarray(hf_out.last_hidden_state.numpy()))))
    delta = float(jnp.max(jnp.abs(out1 - out0)))
    print(f"n=0 vs HF max abs err: {err0:.2e}  (parity)")
    print(f"n={args.n} vs n=0 max abs delta: {delta:.3f}  (surgery active)")

    # per-layer attention-output stats, the outlier measurement workflow
    _, taps = xlnet_forward(params, cfg1, ids, collect_taps=True)
    for name, t in taps.items():
        print(f"  {name}: var={float(jnp.var(t)):.4f}")


if __name__ == "__main__":
    main()
