"""HF checkpoint -> JAX pytree converters (the surgery substrate).

The reference's surgery rewrites *live torch modules* of pretrained HF
models (surgery/surgery_functions/_bert.py, _xlnet.py). The TPU-native
equivalent rewrites *checkpoints*: these converters map HF torch state
dicts into this framework's stacked-layer parameter pytrees, after which
``apply_attention_softmax_n`` sets the softmax-N parameter in the config —
the whole pipeline is pure data transformation, jit/pjit-friendly, and
idempotent (SURVEY.md §5 checkpoint-rewrite design).

Supported families: BERT/RoBERTa encoders, Llama-style decoders, and XLNet.
Torch is used only to read tensors (CPU); nothing torch crosses into the
compute path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from flash_attention_softmax_n_tpu.models.bert import BertConfig
from flash_attention_softmax_n_tpu.models.decoder import DecoderConfig
from flash_attention_softmax_n_tpu.models.xlnet import XLNetConfig

__all__ = [
    "bert_config_from_hf",
    "bert_params_from_hf",
    "llama_config_from_hf",
    "llama_params_from_hf",
    "xlnet_config_from_hf",
    "xlnet_params_from_hf",
]


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16): detach -> cpu -> float32 numpy
    return t.detach().cpu().float().numpy()


def _state_dict(model_or_sd) -> Dict[str, Any]:
    if hasattr(model_or_sd, "state_dict"):
        return model_or_sd.state_dict()
    return dict(model_or_sd)


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):] if k.startswith(prefix) else k: v
                for k, v in sd.items()}
    return sd


# ----------------------------------------------------------------------------
# BERT / RoBERTa
# ----------------------------------------------------------------------------


def bert_config_from_hf(hf_config, softmax_n: float = 0.0,
                        dtype=jnp.float32) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        d_ff=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        softmax_n=softmax_n,
        dtype=dtype,
        is_decoder=getattr(hf_config, "is_decoder", False),
        add_cross_attention=getattr(hf_config, "add_cross_attention", False),
        attn_dropout=getattr(hf_config, "attention_probs_dropout_prob", 0.0),
        hidden_dropout=getattr(hf_config, "hidden_dropout_prob", 0.0),
        position_embedding_type=getattr(hf_config, "position_embedding_type",
                                        "absolute"),
    )


def bert_params_from_hf(model_or_sd, cfg: BertConfig) -> Dict:
    """HF BertModel/RobertaModel state dict -> stacked-layer pytree.

    torch Linear weights are (out, in) and are transposed to (in, out) for
    right-multiplication; per-layer tensors are stacked on axis 0 for scan.
    """
    sd = _state_dict(model_or_sd)
    sd = _strip_prefix(sd, "bert.")
    sd = _strip_prefix(sd, "roberta.")
    g = lambda name: _to_numpy(sd[name])
    dt = cfg.dtype

    def stack(fmt: str, transpose: bool = False):
        arrs = []
        for i in range(cfg.n_layers):
            a = g(fmt.format(i=i))
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dt)

    prefix = "encoder.layer.{i}."
    params = {
        "embeddings": {
            "word": jnp.asarray(g("embeddings.word_embeddings.weight"), dt),
            "position": jnp.asarray(g("embeddings.position_embeddings.weight"), dt),
            "token_type": jnp.asarray(g("embeddings.token_type_embeddings.weight"), dt),
            "ln_scale": jnp.asarray(g("embeddings.LayerNorm.weight"), dt),
            "ln_bias": jnp.asarray(g("embeddings.LayerNorm.bias"), dt),
        },
        "layers": {
            "q_w": stack(prefix + "attention.self.query.weight", transpose=True),
            "q_b": stack(prefix + "attention.self.query.bias"),
            "k_w": stack(prefix + "attention.self.key.weight", transpose=True),
            "k_b": stack(prefix + "attention.self.key.bias"),
            "v_w": stack(prefix + "attention.self.value.weight", transpose=True),
            "v_b": stack(prefix + "attention.self.value.bias"),
            "attn_out_w": stack(prefix + "attention.output.dense.weight", transpose=True),
            "attn_out_b": stack(prefix + "attention.output.dense.bias"),
            "attn_ln_scale": stack(prefix + "attention.output.LayerNorm.weight"),
            "attn_ln_bias": stack(prefix + "attention.output.LayerNorm.bias"),
            "inter_w": stack(prefix + "intermediate.dense.weight", transpose=True),
            "inter_b": stack(prefix + "intermediate.dense.bias"),
            "out_w": stack(prefix + "output.dense.weight", transpose=True),
            "out_b": stack(prefix + "output.dense.bias"),
            "out_ln_scale": stack(prefix + "output.LayerNorm.weight"),
            "out_ln_bias": stack(prefix + "output.LayerNorm.bias"),
        },
        "pooler": {
            "w": jnp.asarray(g("pooler.dense.weight").T, dt),
            "b": jnp.asarray(g("pooler.dense.bias"), dt),
        },
    }
    if cfg.position_embedding_type in ("relative_key", "relative_key_query"):
        params["layers"]["distance_emb"] = stack(
            prefix + "attention.self.distance_embedding.weight")
    if cfg.add_cross_attention:
        params["layers"].update({
            "cross_q_w": stack(prefix + "crossattention.self.query.weight",
                               transpose=True),
            "cross_q_b": stack(prefix + "crossattention.self.query.bias"),
            "cross_k_w": stack(prefix + "crossattention.self.key.weight",
                               transpose=True),
            "cross_k_b": stack(prefix + "crossattention.self.key.bias"),
            "cross_v_w": stack(prefix + "crossattention.self.value.weight",
                               transpose=True),
            "cross_v_b": stack(prefix + "crossattention.self.value.bias"),
            "cross_out_w": stack(prefix + "crossattention.output.dense.weight",
                                 transpose=True),
            "cross_out_b": stack(prefix + "crossattention.output.dense.bias"),
            "cross_ln_scale": stack(
                prefix + "crossattention.output.LayerNorm.weight"),
            "cross_ln_bias": stack(
                prefix + "crossattention.output.LayerNorm.bias"),
        })
    return params


# ----------------------------------------------------------------------------
# Llama
# ----------------------------------------------------------------------------


def llama_config_from_hf(hf_config, softmax_n: float = 0.0,
                         dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        d_ff=hf_config.intermediate_size,
        max_seq_len=hf_config.max_position_embeddings,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
        softmax_n=softmax_n,
        dtype=dtype,
    )


def llama_params_from_hf(model_or_sd, cfg: DecoderConfig) -> Dict:
    """HF LlamaForCausalLM state dict -> stacked-layer pytree."""
    sd = _state_dict(model_or_sd)
    sd = _strip_prefix(sd, "model.")
    g = lambda name: _to_numpy(sd[name])
    dt = cfg.dtype

    def stack(fmt: str, transpose: bool = False):
        arrs = []
        for i in range(cfg.n_layers):
            a = g(fmt.format(i=i))
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dt)

    embed = jnp.asarray(g("embed_tokens.weight"), dt)
    if "lm_head.weight" in sd:
        lm_head = jnp.asarray(g("lm_head.weight").T, dt)
    else:  # tied embeddings
        lm_head = embed.T

    p = "layers.{i}."
    return {
        "embed": embed,
        "layers": {
            "attn_norm": stack(p + "input_layernorm.weight"),
            "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
            "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
            "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
            "wo": stack(p + "self_attn.o_proj.weight", transpose=True),
            "mlp_norm": stack(p + "post_attention_layernorm.weight"),
            "w_gate": stack(p + "mlp.gate_proj.weight", transpose=True),
            "w_up": stack(p + "mlp.up_proj.weight", transpose=True),
            "w_down": stack(p + "mlp.down_proj.weight", transpose=True),
        },
        "final_norm": jnp.asarray(g("norm.weight"), dt),
        "lm_head": lm_head,
    }


# ----------------------------------------------------------------------------
# XLNet
# ----------------------------------------------------------------------------


def xlnet_config_from_hf(hf_config, softmax_n: float = 0.0,
                         dtype=jnp.float32) -> XLNetConfig:
    return XLNetConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        n_layers=hf_config.n_layer,
        n_heads=hf_config.n_head,
        d_head=hf_config.d_head,
        d_inner=hf_config.d_inner,
        ff_activation=hf_config.ff_activation,
        attn_type=hf_config.attn_type,
        bi_data=hf_config.bi_data,
        clamp_len=hf_config.clamp_len,
        same_length=hf_config.same_length,
        mem_len=hf_config.mem_len,
        reuse_len=hf_config.reuse_len,
        layer_norm_eps=hf_config.layer_norm_eps,
        softmax_n=softmax_n,
        dtype=dtype,
        dropout=getattr(hf_config, "dropout", 0.0),
    )


def xlnet_params_from_hf(model_or_sd, cfg: XLNetConfig) -> Dict:
    """HF XLNetModel/XLNetLMHeadModel state dict -> stacked-layer pytree.

    XLNet's projection parameters are already (d_model, n_head, d_head)
    tensors (not torch Linear), so only the FF Linears need transposing;
    per-layer tensors stack on axis 0 for the scanned block body
    (models/xlnet.py). Replaces the reference's live-module rebinding
    (reference surgery/surgery_functions/_xlnet.py:25-75) with the
    checkpoint-rewrite surgery design.
    """
    sd = _state_dict(model_or_sd)
    sd = _strip_prefix(sd, "transformer.")
    g = lambda name: _to_numpy(sd[name])
    dt = cfg.dtype

    def stack(fmt: str, transpose: bool = False):
        arrs = []
        for i in range(cfg.n_layers):
            a = g(fmt.format(i=i))
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dt)

    p = "layer.{i}."
    return {
        "word_embedding": jnp.asarray(g("word_embedding.weight"), dt),
        "mask_emb": jnp.asarray(g("mask_emb"), dt),
        "layers": {
            "q": stack(p + "rel_attn.q"),
            "k": stack(p + "rel_attn.k"),
            "v": stack(p + "rel_attn.v"),
            "o": stack(p + "rel_attn.o"),
            "r": stack(p + "rel_attn.r"),
            "r_w_bias": stack(p + "rel_attn.r_w_bias"),
            "r_r_bias": stack(p + "rel_attn.r_r_bias"),
            "r_s_bias": stack(p + "rel_attn.r_s_bias"),
            "seg_embed": stack(p + "rel_attn.seg_embed"),
            "attn_ln_scale": stack(p + "rel_attn.layer_norm.weight"),
            "attn_ln_bias": stack(p + "rel_attn.layer_norm.bias"),
            "ff1_w": stack(p + "ff.layer_1.weight", transpose=True),
            "ff1_b": stack(p + "ff.layer_1.bias"),
            "ff2_w": stack(p + "ff.layer_2.weight", transpose=True),
            "ff2_b": stack(p + "ff.layer_2.bias"),
            "ff_ln_scale": stack(p + "ff.layer_norm.weight"),
            "ff_ln_bias": stack(p + "ff.layer_norm.bias"),
        },
    }
