"""Weight-only quantization of model parameter pytrees.

Converts a decoder/encoder parameter pytree into one whose matmul weights
are ``QTensor``s (INT8/INT4 with per-output-channel scales, or FP8); the
models' matmul helper dispatches QTensor weights to the fused Pallas
dequant-matmul (kernels/quant_matmul.py). Embeddings stay full precision
(gathers, not matmuls).

The analysis subsystem gates which layers are safe to quantize: see
``quant.gates.outlier_gate`` — the measurement loop the reference's
analysis subpackage exists for (SURVEY §0 pillar 3), closed into an
automated decision here.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax.numpy as jnp

from flash_attention_softmax_n_tpu.quant.qtensor import QTensor, quantize

__all__ = ["DECODER_MATMUL_WEIGHTS", "fuse_decoder_projections",
           "quantize_decoder_weights", "quantize_bert_weights"]

# stacked decoder weights (n_layers, K, N): contraction axis is -2
DECODER_MATMUL_WEIGHTS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
    "wqkv", "w_gu",  # fused variants (fuse_decoder_projections)
)


def fuse_decoder_projections(params: Dict) -> Dict:
    """Concatenate q/k/v -> wqkv and gate/up -> w_gu along the output axis.

    Decode matmuls are bound by per-kernel grid/launch overhead, not MXU:
    fusing cuts a layer from 7 matmuls to 4 (measured 2.61 -> ~2.0 ms for
    a 1.1B int8 stack at b=32 on v5e). Per-output-channel quantization
    scales are unaffected (concatenation along N). models/decoder._layer
    splits the fused outputs.

    NOTE: fused weights are for single-shard serving — the TP sharding
    rules split q/k/v boundaries incorrectly on a fused axis, and
    parallel.serving rejects fused pytrees.
    """
    layers = dict(params["layers"])
    import jax.numpy as _jnp

    layers["wqkv"] = _jnp.concatenate(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1)
    layers["w_gu"] = _jnp.concatenate(
        [layers.pop("w_gate"), layers.pop("w_up")], axis=-1)
    return dict(params, layers=layers)

BERT_MATMUL_WEIGHTS = (
    "q_w", "k_w", "v_w", "attn_out_w", "inter_w", "out_w",
    # decoder-mode cross-attention projections (present only when
    # cfg.add_cross_attention; absent keys are simply not matched)
    "cross_q_w", "cross_k_w", "cross_v_w", "cross_out_w",
)


def _quantize_leaf(w, bits: int) -> QTensor:
    return quantize(w, bits=bits, axis=-2)


def quantize_decoder_weights(params: Dict, bits: int = 8,
                             include: Optional[Iterable[str]] = None,
                             quantize_lm_head: bool = True) -> Dict:
    """Quantize decoder matmul weights to ``bits`` (8, 4, or -8 for fp8).

    ``include``: optional subset of DECODER_MATMUL_WEIGHTS to quantize
    (e.g. the layers that passed the outlier gate).
    """
    names = set(include) if include is not None else set(DECODER_MATMUL_WEIGHTS)
    out = {
        "embed": params["embed"],
        "layers": {
            k: (_quantize_leaf(v, bits) if k in names else v)
            for k, v in params["layers"].items()
        },
        "final_norm": params["final_norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = (_quantize_leaf(params["lm_head"], bits)
                          if quantize_lm_head else params["lm_head"])
    return out


def quantize_bert_weights(params: Dict, bits: int = 8,
                          include: Optional[Iterable[str]] = None) -> Dict:
    names = set(include) if include is not None else set(BERT_MATMUL_WEIGHTS)
    out = dict(params)
    out["layers"] = {
        k: (_quantize_leaf(v, bits) if k in names else v)
        for k, v in params["layers"].items()
    }
    return out
