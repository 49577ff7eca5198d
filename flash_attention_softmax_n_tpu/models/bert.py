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

__all__ = ["BertConfig", "init_bert_params", "init_bert_kv_cache",
           "bert_forward"]


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
    # decoder mode (reference surgery/_bert.py:39-70 pass-through features):
    # causal self-attention + optional cross-attention block per layer
    is_decoder: bool = False
    add_cross_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def init_bert_params(cfg: BertConfig, rng: jax.Array) -> Dict:
    d, f, nl = cfg.d_model, cfg.d_ff, cfg.n_layers
    keys = iter(jax.random.split(rng, 32))

    def w(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32) * 0.02
                ).astype(cfg.dtype)

    def zeros(shape):
        return jnp.zeros(shape, cfg.dtype)

    def ones(shape):
        return jnp.ones(shape, cfg.dtype)

    layers = {
        "q_w": w((nl, d, d), d), "q_b": zeros((nl, d)),
        "k_w": w((nl, d, d), d), "k_b": zeros((nl, d)),
        "v_w": w((nl, d, d), d), "v_b": zeros((nl, d)),
        "attn_out_w": w((nl, d, d), d), "attn_out_b": zeros((nl, d)),
        "attn_ln_scale": ones((nl, d)), "attn_ln_bias": zeros((nl, d)),
        "inter_w": w((nl, d, f), d), "inter_b": zeros((nl, f)),
        "out_w": w((nl, f, d), f), "out_b": zeros((nl, d)),
        "out_ln_scale": ones((nl, d)), "out_ln_bias": zeros((nl, d)),
    }
    if cfg.add_cross_attention:
        layers.update({
            "cross_q_w": w((nl, d, d), d), "cross_q_b": zeros((nl, d)),
            "cross_k_w": w((nl, d, d), d), "cross_k_b": zeros((nl, d)),
            "cross_v_w": w((nl, d, d), d), "cross_v_b": zeros((nl, d)),
            "cross_out_w": w((nl, d, d), d), "cross_out_b": zeros((nl, d)),
            "cross_ln_scale": ones((nl, d)), "cross_ln_bias": zeros((nl, d)),
        })
    return {
        "embeddings": {
            "word": w((cfg.vocab_size, d), d),
            "position": w((cfg.max_position_embeddings, d), d),
            "token_type": w((cfg.type_vocab_size, d), d),
            "ln_scale": ones((d,)),
            "ln_bias": zeros((d,)),
        },
        "layers": layers,
        "pooler": {"w": w((d, d), d), "b": zeros((d,))},
    }


def _heads(x: jax.Array, nh: int, hd: int) -> jax.Array:
    b, l, _ = x.shape
    return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)


def _attend(cfg: BertConfig, q: jax.Array, k: jax.Array, v: jax.Array,
            bias: Optional[jax.Array]) -> jax.Array:
    """(B,H,L,hd) x (B,H,S,hd) softmax-N attention -> (B, L, D)."""
    b, nh, l, hd = q.shape
    scores = jnp.einsum("bhle,bhse->bhls", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    if bias is not None:
        scores = scores + bias
    # The one-line swap the reference performs by monkey-patching
    # (_bert.py:101): standard softmax -> softmax_n.
    probs = softmax_n(scores, n=cfg.softmax_n, axis=-1)
    ctx = jnp.einsum("bhls,bhsv->bhlv", probs.astype(v.dtype), v)
    return ctx.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)


def init_bert_kv_cache(cfg: BertConfig, batch: int,
                       max_len: Optional[int] = None) -> Dict:
    """Static-shape self-attention KV cache for decoder-mode BERT.

    The TPU-native counterpart of HF's growing ``past_key_value`` tuples
    (reference surgery/_bert.py:39-70 passes them through): preallocated
    (n_layers, B, H, S, hd) arrays + one scalar fill length, so every
    incremental ``bert_forward(..., cache=...)`` step compiles once and
    updates in place via dynamic_update_slice — no shape growth, no
    per-step recompilation.
    """
    s = max_len or cfg.max_position_embeddings
    shape = (cfg.n_layers, batch, cfg.n_heads, s, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def bert_forward(
    params: Dict,
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    *,
    encoder_hidden_states: Optional[jax.Array] = None,
    encoder_attention_mask: Optional[jax.Array] = None,
    cache: Optional[Dict] = None,
    collect_taps: bool = False,
) -> Any:
    """HF-BertModel-compatible forward (encoder and decoder modes).

    input_ids (B, L) int32; attention_mask (B, L) with 1 = attend (HF
    convention, converted to an additive (B,1,1,L) bias exactly as HF's
    get_extended_attention_mask does); returns dict with
    'last_hidden_state' (B, L, D) and 'pooler_output' (B, D).

    Decoder-mode features (parity with the reference's patched forward,
    reference surgery/_bert.py:39-70):
      * ``cfg.is_decoder``: causal self-attention;
      * ``encoder_hidden_states`` (B, S_enc, D) + optional
        ``encoder_attention_mask`` (B, S_enc): per-layer cross-attention
        (requires ``cfg.add_cross_attention`` params);
      * ``cache`` (init_bert_kv_cache): incremental decoding — the L new
        tokens append at cache['length'] and self-attention spans the
        whole cached prefix. Cached sequences are dense/left-aligned
        (``attention_mask`` must be None; validity comes from the fill
        length — the engine convention, not HF's full-width mask). The
        result dict gains a 'cache' entry.
    """
    b, l = input_ids.shape
    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if cache is not None and attention_mask is not None:
        raise ValueError(
            "cached decoding tracks validity via cache['length']; pass "
            "dense left-aligned sequences with attention_mask=None")
    past = cache["length"] if cache is not None else jnp.zeros((), jnp.int32)
    positions = past + jnp.arange(l)
    x = (emb["word"][input_ids]
         + emb["position"][positions][None]
         + emb["token_type"][token_type_ids])
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)

    neg = jnp.finfo(jnp.float32).min
    nh, hd = cfg.n_heads, cfg.head_dim

    # self-attention bias over the key axis
    if cache is not None:
        s = cache["k"].shape[3]
        key_pos = jnp.arange(s)
        valid = key_pos[None, :] < (past + l)  # (1, S)
        if cfg.is_decoder:
            valid = valid & (key_pos[None, :] <= positions[:, None])  # (L, S)
        bias = jnp.where(valid, 0.0, neg)[None, None]  # (1,1,L|1,S)
        bias = jnp.broadcast_to(bias, (1, 1, l, s)).astype(jnp.float32)
    else:
        bias = None
        if cfg.is_decoder:
            causal = jnp.tril(jnp.ones((l, l), bool))
            bias = jnp.where(causal, 0.0, neg)[None, None]
        if attention_mask is not None:
            pad = (1.0 - attention_mask[:, None, None, :]
                   .astype(jnp.float32)) * neg
            bias = pad if bias is None else bias + pad

    cross_bias = None
    if encoder_hidden_states is not None and encoder_attention_mask is not None:
        cross_bias = (1.0 - encoder_attention_mask[:, None, None, :]
                      .astype(jnp.float32)) * neg

    def body(x, layer_in):
        lp, kv = layer_in
        q = _heads(_mm(x, lp["q_w"]) + lp["q_b"], nh, hd)
        k = _heads(_mm(x, lp["k_w"]) + lp["k_b"], nh, hd)
        v = _heads(_mm(x, lp["v_w"]) + lp["v_b"], nh, hd)
        if kv is not None:
            k_cache = jax.lax.dynamic_update_slice(
                kv["k"], k.astype(kv["k"].dtype), (0, 0, past, 0))
            v_cache = jax.lax.dynamic_update_slice(
                kv["v"], v.astype(kv["v"].dtype), (0, 0, past, 0))
            k, v = k_cache, v_cache
            new_kv = {"k": k_cache, "v": v_cache}
        else:
            new_kv = 0
        ctx = _attend(cfg, q, k, v, bias)
        attn_out = _mm(ctx, lp["attn_out_w"]) + lp["attn_out_b"]
        x = layer_norm(attn_out + x, lp["attn_ln_scale"], lp["attn_ln_bias"],
                       cfg.layer_norm_eps)
        if encoder_hidden_states is not None:
            cq = _heads(_mm(x, lp["cross_q_w"]) + lp["cross_q_b"], nh, hd)
            ck = _heads(_mm(encoder_hidden_states, lp["cross_k_w"])
                        + lp["cross_k_b"], nh, hd)
            cv = _heads(_mm(encoder_hidden_states, lp["cross_v_w"])
                        + lp["cross_v_b"], nh, hd)
            cctx = _attend(cfg, cq, ck, cv, cross_bias)
            cross_out = _mm(cctx, lp["cross_out_w"]) + lp["cross_out_b"]
            x = layer_norm(cross_out + x, lp["cross_ln_scale"],
                           lp["cross_ln_bias"], cfg.layer_norm_eps)
        inter = gelu(_mm(x, lp["inter_w"]) + lp["inter_b"])
        out = _mm(inter, lp["out_w"]) + lp["out_b"]
        x = layer_norm(out + x, lp["out_ln_scale"], lp["out_ln_bias"],
                       cfg.layer_norm_eps)
        return x, (attn_out if collect_taps else 0, new_kv)

    if cache is not None:
        xs = (params["layers"], {"k": cache["k"], "v": cache["v"]})
    else:
        xs = (params["layers"], None)
    x, (tap_stack, kv_stack) = jax.lax.scan(body, x, xs)

    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"])
    result = {"last_hidden_state": x, "pooler_output": pooled}
    if cache is not None:
        result["cache"] = {"k": kv_stack["k"], "v": kv_stack["v"],
                           "length": past + l}
    if collect_taps:
        taps = {f"encoder.layer.{i}.attention.output": tap_stack[i]
                for i in range(cfg.n_layers)}
        return result, taps
    return result
