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
    # training-mode dropout (HF attention_probs_dropout_prob /
    # hidden_dropout_prob; the reference's patched modules keep their
    # nn.Dropout live for fine-tuning, surgery/_bert.py:102-107). Active
    # only under bert_forward(train=True).
    attn_dropout: float = 0.0
    hidden_dropout: float = 0.0
    # 'absolute' | 'relative_key' | 'relative_key_query' (HF BERT; the
    # reference's patched forward preserves the relative paths,
    # surgery/_bert.py:75-93). Relative modes add a learned per-layer
    # distance embedding to the attention scores.
    position_embedding_type: str = "absolute"

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
    if cfg.position_embedding_type in ("relative_key", "relative_key_query"):
        # HF BertSelfAttention.distance_embedding: one per layer,
        # (2 * max_position_embeddings - 1, head_dim)
        layers["distance_emb"] = w(
            (nl, 2 * cfg.max_position_embeddings - 1, cfg.head_dim), d)
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
            bias: Optional[jax.Array], *,
            rel_scores: Optional[jax.Array] = None,
            head_mask: Optional[jax.Array] = None,
            dp: float = 0.0,
            dropout_key: Optional[jax.Array] = None):
    """(B,H,L,hd) x (B,H,S,hd) softmax-N attention -> ((B, L, D), probs).

    Mirrors the reference's patched BertSelfAttention ordering exactly
    (surgery/_bert.py:95-112): (scores + relative) -> mask -> softmax_n ->
    dropout -> head_mask -> context; the returned probs are post-dropout,
    post-head_mask — what HF's output_attentions exposes.
    """
    b, nh, l, hd = q.shape
    scores = jnp.einsum("bhle,bhse->bhls", q, k,
                        preferred_element_type=jnp.float32)
    if rel_scores is not None:
        scores = scores + rel_scores
    scores = scores * (hd ** -0.5)
    if bias is not None:
        scores = scores + bias
    # The one-line swap the reference performs by monkey-patching
    # (_bert.py:101): standard softmax -> softmax_n.
    probs = softmax_n(scores, n=cfg.softmax_n, axis=-1)
    if dp > 0.0:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dp, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dp), 0.0)
    if head_mask is not None:
        probs = probs * head_mask
    ctx = jnp.einsum("bhls,bhsv->bhlv", probs.astype(v.dtype), v)
    return ctx.transpose(0, 2, 1, 3).reshape(b, l, nh * hd), probs


def _relative_scores(cfg: BertConfig, q: jax.Array, k: jax.Array,
                     distance_emb: jax.Array,
                     q_positions: jax.Array) -> jax.Array:
    """HF relative_key(-query) position scores, added BEFORE the 1/sqrt(hd)
    scaling (the reference divides the merged scores, _bert.py:75-95).

    ``q_positions`` are absolute query positions — with a cache the
    reference indexes the distance embedding at key_length-1 for the one
    new token (_bert.py:77-81); past + arange(L) generalizes that.
    """
    s = k.shape[2]
    pos_l = q_positions[:, None]
    pos_r = jnp.arange(s)[None, :]
    emb = distance_emb[pos_l - pos_r + cfg.max_position_embeddings - 1]
    emb = emb.astype(q.dtype)  # (L, S, hd)
    scores = jnp.einsum("bhld,lrd->bhlr", q, emb,
                        preferred_element_type=jnp.float32)
    if cfg.position_embedding_type == "relative_key_query":
        scores = scores + jnp.einsum("bhrd,lrd->bhlr", k, emb,
                                     preferred_element_type=jnp.float32)
    return scores


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
    head_mask: Optional[jax.Array] = None,
    output_attentions: bool = False,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
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

    Training-mode features (parity with the reference's patched forward
    plus HF's surrounding encoder, surgery/_bert.py:102-112):
      * ``train=True`` activates ``cfg.attn_dropout`` (attention probs)
        and ``cfg.hidden_dropout`` (embeddings + each dense output before
        residual+LN, HF placement); requires ``dropout_rng``;
      * ``head_mask``: (n_layers, n_heads) or (n_heads,) multiplicative
        per-head gate applied AFTER dropout (_bert.py:107-109), also to
        cross-attention (HF BertLayer passes the layer head_mask through);
      * ``output_attentions=True``: result dict gains 'attentions'
        (n_layers, B, H, L, S) — post-dropout, post-head_mask probs, the
        same tensor the reference returns (_bert.py:118) — and, in
        cross-attention mode, 'cross_attentions'.
    """
    b, l = input_ids.shape
    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if cache is not None and attention_mask is not None:
        raise ValueError(
            "cached decoding tracks validity via cache['length']; pass "
            "dense left-aligned sequences with attention_mask=None")
    attn_dp = cfg.attn_dropout if train else 0.0
    hidden_dp = cfg.hidden_dropout if train else 0.0
    if (attn_dp > 0.0 or hidden_dp > 0.0) and dropout_rng is None:
        raise ValueError("train=True with dropout > 0 requires dropout_rng")
    if head_mask is not None:
        head_mask = jnp.asarray(head_mask)
        if head_mask.ndim == 1:  # (H,) shared across layers
            head_mask = jnp.broadcast_to(head_mask[None],
                                         (cfg.n_layers, cfg.n_heads))
        # -> (n_layers, 1, H, 1, 1), broadcast against (B, H, L, S)
        head_mask = head_mask.reshape(cfg.n_layers, 1, cfg.n_heads, 1, 1)

    def _hidden_drop(x, key):
        if hidden_dp == 0.0:
            return x
        keep = jax.random.bernoulli(key, 1.0 - hidden_dp, x.shape)
        return jnp.where(keep, x / (1.0 - hidden_dp),
                         jnp.zeros((), x.dtype))

    if attn_dp > 0.0 or hidden_dp > 0.0:
        emb_key, layers_key = jax.random.split(dropout_rng)
        # 5 independent streams per layer: self-probs, post-attn dense,
        # cross-probs, post-cross dense, post-ffn dense
        layer_keys = jax.random.split(layers_key, cfg.n_layers * 5)
        layer_keys = layer_keys.reshape(
            (cfg.n_layers, 5) + layer_keys.shape[1:])
    else:
        emb_key = layer_keys = None

    past = cache["length"] if cache is not None else jnp.zeros((), jnp.int32)
    positions = past + jnp.arange(l)
    x = emb["word"][input_ids] + emb["token_type"][token_type_ids]
    if cfg.position_embedding_type == "absolute":
        # HF BertEmbeddings adds absolute position embeddings ONLY in
        # absolute mode; relative modes score distance inside attention
        x = x + emb["position"][positions][None]
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    if emb_key is not None:
        x = _hidden_drop(x, emb_key)

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

    relative = cfg.position_embedding_type in ("relative_key",
                                               "relative_key_query")

    def body(x, layer_in):
        lp, kv, keys, hm = layer_in
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
        rel = (_relative_scores(cfg, q, k, lp["distance_emb"], positions)
               if relative else None)
        ctx, probs = _attend(
            cfg, q, k, v, bias, rel_scores=rel, head_mask=hm,
            dp=attn_dp, dropout_key=keys[0] if keys is not None else None)
        attn_out = _mm(ctx, lp["attn_out_w"]) + lp["attn_out_b"]
        if keys is not None:
            attn_out = _hidden_drop(attn_out, keys[1])
        x = layer_norm(attn_out + x, lp["attn_ln_scale"], lp["attn_ln_bias"],
                       cfg.layer_norm_eps)
        cross_probs = 0
        if encoder_hidden_states is not None:
            cq = _heads(_mm(x, lp["cross_q_w"]) + lp["cross_q_b"], nh, hd)
            ck = _heads(_mm(encoder_hidden_states, lp["cross_k_w"])
                        + lp["cross_k_b"], nh, hd)
            cv = _heads(_mm(encoder_hidden_states, lp["cross_v_w"])
                        + lp["cross_v_b"], nh, hd)
            cctx, cprobs = _attend(
                cfg, cq, ck, cv, cross_bias, head_mask=hm,
                dp=attn_dp, dropout_key=keys[2] if keys is not None else None)
            if output_attentions:
                cross_probs = cprobs
            cross_out = _mm(cctx, lp["cross_out_w"]) + lp["cross_out_b"]
            if keys is not None:
                cross_out = _hidden_drop(cross_out, keys[3])
            x = layer_norm(cross_out + x, lp["cross_ln_scale"],
                           lp["cross_ln_bias"], cfg.layer_norm_eps)
        inter = gelu(_mm(x, lp["inter_w"]) + lp["inter_b"])
        out = _mm(inter, lp["out_w"]) + lp["out_b"]
        if keys is not None:
            out = _hidden_drop(out, keys[4])
        x = layer_norm(out + x, lp["out_ln_scale"], lp["out_ln_bias"],
                       cfg.layer_norm_eps)
        return x, (attn_out if collect_taps else 0, new_kv,
                   probs if output_attentions else 0, cross_probs)

    xs = (params["layers"],
          {"k": cache["k"], "v": cache["v"]} if cache is not None else None,
          layer_keys, head_mask)
    x, (tap_stack, kv_stack, prob_stack, cross_stack) = jax.lax.scan(
        body, x, xs)

    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"])
    result = {"last_hidden_state": x, "pooler_output": pooled}
    if cache is not None:
        result["cache"] = {"k": kv_stack["k"], "v": kv_stack["v"],
                           "length": past + l}
    if output_attentions:
        result["attentions"] = prob_stack
        if encoder_hidden_states is not None:
            result["cross_attentions"] = cross_stack
    if collect_taps:
        taps = {f"encoder.layer.{i}.attention.output": tap_stack[i]
                for i in range(cfg.n_layers)}
        return result, taps
    return result
