"""BERT-family encoder with softmax-N attention.

The TPU-native counterpart of the reference's BERT/RoBERTa surgery targets:
where the reference monkey-patches ``BertSelfAttention.forward`` to swap in
``softmax_n`` (reference surgery/surgery_functions/_bert.py:19-21,101), we
ship a first-party encoder whose attention takes ``softmax_n`` from config,
plus an HF checkpoint converter (surgery/convert.py) — surgery becomes a
pure checkpoint/config rewrite instead of live-object mutation.

Numerics match HF ``BertModel`` at softmax_n=0 (validated against a
random-init torch BertModel in tests/test_bert_parity.py), so the n=0
"surgery is a no-op" invariant of the reference's test suite
(tests/cpu/surgery/test_bert.py:26) holds by construction.

Layer weights are stacked and scanned (one compiled block body), taps follow
the reference's ``'attention.output'`` naming (hooks.py:55-56).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.models.decoder import _mm

from flash_attention_softmax_n_tpu.models.layers import gelu, layer_norm
from flash_attention_softmax_n_tpu.ops.functional import softmax_n

__all__ = ["BertConfig", "init_bert_params", "bert_forward"]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    softmax_n: float = 0.0
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def init_bert_params(cfg: BertConfig, rng: jax.Array) -> Dict:
    d, f, nl = cfg.d_model, cfg.d_ff, cfg.n_layers
    keys = iter(jax.random.split(rng, 24))

    def w(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32) * 0.02
                ).astype(cfg.dtype)

    def zeros(shape):
        return jnp.zeros(shape, cfg.dtype)

    def ones(shape):
        return jnp.ones(shape, cfg.dtype)

    return {
        "embeddings": {
            "word": w((cfg.vocab_size, d), d),
            "position": w((cfg.max_position_embeddings, d), d),
            "token_type": w((cfg.type_vocab_size, d), d),
            "ln_scale": ones((d,)),
            "ln_bias": zeros((d,)),
        },
        "layers": {
            "q_w": w((nl, d, d), d), "q_b": zeros((nl, d)),
            "k_w": w((nl, d, d), d), "k_b": zeros((nl, d)),
            "v_w": w((nl, d, d), d), "v_b": zeros((nl, d)),
            "attn_out_w": w((nl, d, d), d), "attn_out_b": zeros((nl, d)),
            "attn_ln_scale": ones((nl, d)), "attn_ln_bias": zeros((nl, d)),
            "inter_w": w((nl, d, f), d), "inter_b": zeros((nl, f)),
            "out_w": w((nl, f, d), f), "out_b": zeros((nl, d)),
            "out_ln_scale": ones((nl, d)), "out_ln_bias": zeros((nl, d)),
        },
        "pooler": {"w": w((d, d), d), "b": zeros((d,))},
    }


def _self_attention(cfg: BertConfig, h: jax.Array, lp: Dict,
                    bias: Optional[jax.Array]) -> jax.Array:
    b, l, d = h.shape
    nh, hd = cfg.n_heads, cfg.head_dim

    def heads(x):
        return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

    q = heads(_mm(h, lp["q_w"]) + lp["q_b"])
    k = heads(_mm(h, lp["k_w"]) + lp["k_b"])
    v = heads(_mm(h, lp["v_w"]) + lp["v_b"])

    scores = jnp.einsum("bhle,bhse->bhls", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    if bias is not None:
        scores = scores + bias
    # The one-line swap the reference performs by monkey-patching
    # (_bert.py:101): standard softmax -> softmax_n.
    probs = softmax_n(scores, n=cfg.softmax_n, axis=-1)
    ctx = jnp.einsum("bhls,bhsv->bhlv", probs.astype(v.dtype), v)
    return ctx.transpose(0, 2, 1, 3).reshape(b, l, d)


def bert_forward(
    params: Dict,
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    *,
    collect_taps: bool = False,
) -> Any:
    """HF-BertModel-compatible forward.

    input_ids (B, L) int32; attention_mask (B, L) with 1 = attend (HF
    convention, converted to an additive (B,1,1,L) bias exactly as HF's
    get_extended_attention_mask does); returns dict with
    'last_hidden_state' (B, L, D) and 'pooler_output' (B, D).
    """
    b, l = input_ids.shape
    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = (emb["word"][input_ids]
         + emb["position"][jnp.arange(l)][None]
         + emb["token_type"][token_type_ids])
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)

    bias = None
    if attention_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg

    def body(x, lp):
        ctx = _self_attention(cfg, x, lp, bias)
        attn_out = _mm(ctx, lp["attn_out_w"]) + lp["attn_out_b"]
        x = layer_norm(attn_out + x, lp["attn_ln_scale"], lp["attn_ln_bias"],
                       cfg.layer_norm_eps)
        inter = gelu(_mm(x, lp["inter_w"]) + lp["inter_b"])
        out = _mm(inter, lp["out_w"]) + lp["out_b"]
        x = layer_norm(out + x, lp["out_ln_scale"], lp["out_ln_bias"],
                       cfg.layer_norm_eps)
        return x, attn_out if collect_taps else 0

    x, tap_stack = jax.lax.scan(body, x, params["layers"])

    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"])
    result = {"last_hidden_state": x, "pooler_output": pooled}
    if collect_taps:
        taps = {f"encoder.layer.{i}.attention.output": tap_stack[i]
                for i in range(cfg.n_layers)}
        return result, taps
    return result
