"""Llama-style decoder with softmax-N attention — the flagship model.

Net-new capability relative to the reference (which only *patches* HF
models, surgery/surgery_functions/_bert.py): a first-party TPU-native
decoder designed for the softmax-N quantized-inference north star:

  * explicit parameter pytree with **stacked layer weights** scanned via
    ``lax.scan`` (one compiled layer body regardless of depth — fast compile,
    pjit-friendly);
  * prefill through the fused Pallas flash-attention-N kernel (causal);
  * KV-cache decode with the ``+n`` denominator term applied per step (each
    decode step's softmax denominator includes +n — the invariant SURVEY §7
    step 5 calls out);
  * GQA/MQA via ``n_kv_heads``;
  * activation taps for the analysis subsystem (tap names follow the
    reference's ``'attention.output'`` convention, hooks.py:55-56).

HF-Llama weight layout compatibility is provided by
``surgery.convert.llama_params_from_hf``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.models.layers import (
    apply_rope,
    rms_norm,
    rope_frequencies,
)
from flash_attention_softmax_n_tpu.ops.flash_attention import flash_attention_n
from flash_attention_softmax_n_tpu.ops.functional import softmax_n

__all__ = ["DecoderConfig", "init_decoder_params", "decoder_forward",
           "prefill", "decode_step", "greedy_generate", "init_kv_cache"]

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    d_model: int = 2048
    n_layers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 5632
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    softmax_n: float = 1.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # kernel selection: 'pallas' on TPU, 'xla' exact fallback
    attn_implementation: str = "auto"
    # activation quantization for QTensor matmuls: 8 -> W8A8/W4A8 (int8
    # activations on the MXU, rank-1 dequant epilogue). Gate with
    # quant.gates (softmax-N outlier suppression is what makes this safe).
    act_bits: Any = None
    # int8 weight-only matmul route: "xla" (default) streams the int8
    # weights through XLA's native matmul with the dequant fused into the
    # operand — measured faster than the Pallas kernel inside the fused
    # decode loop on v5e at every serving batch (b=512: 15.3 vs 16.8
    # ms/step; b=256: 8.4 vs 10.0). "pallas" keeps
    # kernels/quant_matmul.py (which still serves W8A8 and int4, and
    # enables the fused-MLP kernel). Baked in at trace time.
    int8_mm_impl: str = "xla"
    # decode attention route: "xla" (default) — batched-matvec stats over
    # the bucketed cache view, measured fastest on v5e round 1; "pallas" —
    # the length-clamped-DMA kernel (kernels/decode_attention.py), whose
    # per-slot clamping wins when slot lengths vary widely (re-measure
    # after the hd-unpadded fix with scripts/bench_decode_attn.py)
    decode_attn_impl: str = "xla"
    # gradient rematerialization: recompute each layer in the backward
    # pass instead of storing its activations — O(1) activation memory in
    # depth, the standard long-sequence training trade (jax.checkpoint)
    remat: bool = False
    # attention-probability dropout for fine-tuning (reference parity:
    # the patched modules keep their nn.Dropout live, surgery/_bert.py:102,
    # _xlnet.py:63). Active only under decoder_forward(train=True); rides
    # the in-kernel hash dropout on the Pallas path — no HBM mask.
    attn_dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def init_decoder_params(cfg: DecoderConfig, rng: jax.Array) -> Dict:
    """Random-init parameter pytree (layer weights stacked on axis 0)."""
    d, hd = cfg.d_model, cfg.head_dim
    nl, h, kvh, f = cfg.n_layers, cfg.n_heads, cfg.n_kv_heads, cfg.d_ff
    keys = jax.random.split(rng, 10)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(cfg.dtype)

    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),
        "layers": {
            "attn_norm": jnp.ones((nl, d), cfg.dtype),
            "wq": dense(keys[1], (nl, d, h * hd), d),
            "wk": dense(keys[2], (nl, d, kvh * hd), d),
            "wv": dense(keys[3], (nl, d, kvh * hd), d),
            "wo": dense(keys[4], (nl, h * hd, d), h * hd),
            "mlp_norm": jnp.ones((nl, d), cfg.dtype),
            "w_gate": dense(keys[5], (nl, d, f), d),
            "w_up": dense(keys[6], (nl, d, f), d),
            "w_down": dense(keys[7], (nl, f, d), f),
        },
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": dense(keys[8], (d, cfg.vocab_size), d),
    }


def _mm(x: jax.Array, w, act_bits=None, int8_mm_impl: str = "xla"
        ) -> jax.Array:
    """Matmul dispatching on weight type: dense array or quantized QTensor.

    int8 QTensor weights route per ``int8_mm_impl`` (cfg.int8_mm_impl —
    XLA fused-dequant by default, the Pallas kernel via "pallas"); int4
    goes to the Pallas unpack kernel; FP8 dequantizes inline.
    ``act_bits=8`` additionally quantizes the activations per row
    (W8A8/W4A8 — cfg.act_bits) on the Pallas int8-MXU path.
    """
    from flash_attention_softmax_n_tpu.quant.qtensor import QTensor, dequantize

    if isinstance(w, QTensor):
        k = w.logical_shape[-2]
        if w.bits == -8 or (w.bits == 4 and k % 256):
            # fp8, or int4 below the kernel's grouped-packing granularity:
            # dequantize inline (XLA fuses the cast into the matmul)
            return x @ dequantize(w, x.dtype)
        if (w.bits == 8 and act_bits != 8 and w.packed_axis is None
                and int8_mm_impl == "xla"):
            # f32 scale multiply, then one cast (quant/qtensor.dequantize
            # semantics) — XLA fuses the whole chain into the dot operand
            return x @ dequantize(w, x.dtype)
        from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
            quantized_matmul,
        )
        return quantized_matmul(x, w.values, w.scales, bits=w.bits,
                                act_quant=act_bits == 8)
    return x @ w


def _mlp_fusable(h: jax.Array, lp, act_bits,
                 int8_mm_impl: str = "xla") -> bool:
    """Route the decode-regime SwiGLU block to the single fused Pallas
    kernel (kernels/fused_mlp.py): int8 QTensor gate/up/down, single-token
    decode (L == 1; prefill stays on the compute-tuned 2-kernel path even
    when a small batched-admission group fits the M bound), no activation
    quantization (W8A8 keeps the 2-kernel path)."""
    import math

    from flash_attention_softmax_n_tpu.kernels.fused_mlp import (
        mlp_fusion_eligible,
    )
    from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

    ws = [lp.get("w_gate"), lp.get("w_up"), lp.get("w_down")]
    if int8_mm_impl != "pallas":
        # with the XLA fused-dequant route, the 2-kernel (well, 2-matmul)
        # path measures faster than the fused Pallas MLP at every serving
        # batch — fusion only pays when the Pallas matmuls are the baseline
        return False
    if act_bits is not None or h.shape[-2] != 1 or not all(
            isinstance(w, QTensor) and w.bits == 8 and w.packed_axis is None
            for w in ws):
        return False
    m_total = math.prod(h.shape[:-1])
    k, f = ws[0].values.shape
    return (ws[1].values.shape == (k, f) and ws[2].values.shape == (f, k)
            and mlp_fusion_eligible(m_total, k, f, 8))


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, l, _ = x.shape
    return x.reshape(b, l, n_heads, -1).transpose(0, 2, 1, 3)  # (B,H,L,hd)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, kvh, l, hd = x.shape
    return jnp.broadcast_to(
        x[:, :, None], (b, kvh, n_rep, l, hd)
    ).reshape(b, kvh * n_rep, l, hd)


def _layer(cfg: DecoderConfig, rope, x, lp, attn_fn):
    """One transformer block. ``attn_fn(q, k, v) -> ctx`` closes over cache/mask.

    Supports fused projections (quant.fuse_decoder_projections): ``wqkv``
    replaces wq/wk/wv and ``w_gu`` replaces w_gate/w_up — one weight
    stream each, outputs split here. Decode matmuls are launch-overhead
    bound, so fewer kernels is a direct win.
    """
    ab, mi = cfg.act_bits, cfg.int8_mm_impl

    def mm(a, w):
        return _mm(a, w, ab, mi)

    h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
    if "wqkv" in lp:
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.n_kv_heads * cfg.head_dim
        qkv = mm(h, lp["wqkv"])
        q = _split_heads(qkv[..., :qd], cfg.n_heads)
        k = _split_heads(qkv[..., qd:qd + kvd], cfg.n_kv_heads)
        v = _split_heads(qkv[..., qd + kvd:], cfg.n_kv_heads)
    else:
        q = _split_heads(mm(h, lp["wq"]), cfg.n_heads)
        k = _split_heads(mm(h, lp["wk"]), cfg.n_kv_heads)
        v = _split_heads(mm(h, lp["wv"]), cfg.n_kv_heads)
    ctx, extras = attn_fn(q, k, v)
    attn_out = mm(_merge_heads(ctx), lp["wo"])
    x = x + attn_out
    h = rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
    if "w_gu" in lp:
        gu = mm(h, lp["w_gu"])
        gate, up = jnp.split(gu, 2, axis=-1)
        mlp = mm(jax.nn.silu(gate) * up, lp["w_down"])
    elif _mlp_fusable(h, lp, ab, mi):
        from flash_attention_softmax_n_tpu.kernels.fused_mlp import (
            fused_mlp_matmul,
        )
        wg, wu, wd = lp["w_gate"], lp["w_up"], lp["w_down"]
        mlp = fused_mlp_matmul(h, wg.values, wg.scales, wu.values, wu.scales,
                               wd.values, wd.scales)
    else:
        mlp = mm(jax.nn.silu(mm(h, lp["w_gate"])) * mm(h, lp["w_up"]),
                 lp["w_down"])
    x = x + mlp
    return x, attn_out, extras


def decoder_forward(
    params: Dict,
    cfg: DecoderConfig,
    tokens: jax.Array,
    *,
    collect_taps: bool = False,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    output_attentions: bool = False,
    sp_mesh=None,
    sp_axis: str = "sp",
    tp_mesh=None,
) -> Any:
    """Full-sequence causal forward: tokens (B, L) -> logits (B, L, V).

    With ``collect_taps=True`` returns (logits, taps) where taps maps
    'layers.{i}.attention.output' -> (B, L, D) for the analysis collector.

    ``train=True`` activates ``cfg.attn_dropout`` (requires ``dropout_rng``;
    one fold per layer) — the fine-tune regularization path. On the Pallas
    route the mask is the in-kernel hash (kernels/flash_attention.py),
    including under ``tp_mesh`` (round 5: each shard folds its global
    batch/head base into the seed, so the sharded mask is bit-identical
    to the single-device one); under ``sp_mesh`` dropout raises.

    ``output_attentions=True`` returns (logits, ..., attn_probs) with
    attn_probs (n_layers, B, H, L, L) post-softmax (post-dropout when
    training) probabilities via the materializing XLA path — the inspection
    escape hatch for softmax-N outlier analysis (reference parity:
    surgery/_xlnet.py:72-73 returns attn_prob on request).

    ``sp_mesh``/``sp_axis``: sequence-parallel training — attention runs as
    ring attention over the ``sp_axis`` mesh axis (parallel/ring_attention),
    with K/V blocks rotating over ICI while everything outside attention
    stays ordinary GSPMD (sequence-sharded activations partition the
    elementwise/matmul ops for free; only attention mixes positions).

    ``tp_mesh``: tensor/data-parallel training with the fused Pallas
    attention — the kernel is shard_mapped over (batch='data',
    heads='model') since GSPMD cannot partition a pallas_call itself
    (same mechanism as the engine's meshed prefill). Ignored when
    ``sp_mesh`` is set (the ring path partitions via its own shard_map)
    or when attention resolves to the XLA implementation.
    """
    b, l = tokens.shape
    x = params["embed"][tokens].astype(cfg.dtype)
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    positions = jnp.arange(l)

    dp = cfg.attn_dropout if train else 0.0
    if dp > 0.0 and dropout_rng is None:
        raise ValueError("train=True with cfg.attn_dropout > 0 requires "
                         "dropout_rng")
    if dp > 0.0 and sp_mesh is not None:
        raise NotImplementedError(
            "ring (sequence-parallel) attention has no dropout path; "
            "train with tp_mesh or dp-only sharding instead")
    if output_attentions and sp_mesh is not None:
        raise NotImplementedError(
            "output_attentions materializes (B, H, L, L) probabilities; "
            "the ring path never forms them — run without sp_mesh")

    def attn(q, k, v, key):
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
        if sp_mesh is not None:
            from flash_attention_softmax_n_tpu.parallel.ring_attention import (
                ring_attention_n,
            )
            # GQA kv stays un-repeated: the ring rotates the small heads
            # and repeats locally per block (group-factor less ICI traffic)
            ctx = ring_attention_n(
                q, k, v, mesh=sp_mesh, axis_name=sp_axis,
                softmax_n_param=cfg.softmax_n, is_causal=True)
            return ctx, None
        k = _repeat_kv(k, cfg.n_heads // cfg.n_kv_heads)
        v = _repeat_kv(v, cfg.n_heads // cfg.n_kv_heads)
        if output_attentions:
            # materializing path: same numerics as implementation='xla'
            scores = jnp.einsum("bhle,bhse->bhls", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores * jnp.float32(cfg.head_dim ** -0.5)
            causal = jnp.tril(jnp.ones((l, l), bool))
            scores = jnp.where(causal, scores, -jnp.inf)
            probs = softmax_n(scores, n=cfg.softmax_n, axis=-1)
            if dp > 0.0:
                keep = jax.random.bernoulli(key, 1.0 - dp, probs.shape)
                probs = jnp.where(keep, probs / (1.0 - dp), 0.0)
            ctx = jnp.einsum("bhls,bhsv->bhlv", probs.astype(q.dtype), v)
            return ctx, probs
        ctx = flash_attention_n(
            q, k, v,
            softmax_n_param=cfg.softmax_n,
            is_causal=True,
            dropout_p=dp,
            train=train,
            dropout_rng=key,
            implementation=cfg.attn_implementation,
            mesh=tp_mesh,
        )
        return ctx, None

    def body(x, layer_in):
        lp, key = layer_in
        x, attn_out, probs = _layer(cfg, (cos, sin), x, lp,
                                    lambda q, k, v: attn(q, k, v, key))
        return x, (attn_out if collect_taps else 0,
                   probs if output_attentions else 0)

    layer_keys = (jax.random.split(dropout_rng, cfg.n_layers)
                  if dp > 0.0 else None)
    if cfg.remat:
        body = jax.checkpoint(body)
    x, (tap_stack, prob_stack) = jax.lax.scan(
        body, x, (params["layers"], layer_keys))
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm(x, params["lm_head"], cfg.act_bits,
                 cfg.int8_mm_impl).astype(jnp.float32)

    out = (logits,)
    if collect_taps:
        out += ({f"layers.{i}.attention.output": tap_stack[i]
                 for i in range(cfg.n_layers)},)
    if output_attentions:
        out += (prob_stack,)
    return out[0] if len(out) == 1 else out


# ----------------------------------------------------------------------------
# KV-cache inference
# ----------------------------------------------------------------------------


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: Optional[int] = None,
                  dtype: Optional[Any] = None,
                  quantization: Optional[str] = None) -> Dict:
    """Preallocated static-shape KV cache: (n_layers, B, KVH, S, hd).

    ``quantization``: None (dense, ``dtype`` storage), 'int8', or 'fp8' —
    quantized caches store QTensors with per-token-per-head scales
    (quant/kv_cache.py) and halve (or better) decode HBM traffic.
    """
    s = max_len or cfg.max_seq_len
    if quantization is not None:
        from flash_attention_softmax_n_tpu.quant.kv_cache import (
            init_quantized_kv_cache,
        )
        return init_quantized_kv_cache(cfg.n_layers, batch, cfg.n_kv_heads,
                                       s, cfg.head_dim, mode=quantization)
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, s, cfg.head_dim)
    dt = dtype or cfg.dtype
    return {
        "k": jnp.zeros(shape, dt),
        "v": jnp.zeros(shape, dt),
        "length": jnp.zeros((), jnp.int32),
    }


def prefill(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
            cache: Dict) -> Tuple[jax.Array, Dict]:
    """Process the prompt (B, L), fill the cache, return last-token logits."""
    b, l = tokens.shape
    x = params["embed"][tokens].astype(cfg.dtype)
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    positions = jnp.arange(l)

    def body(carry, layer_in):
        x = carry
        lp, layer_idx = layer_in

        new_kv = {}

        def attn(q, k, v):
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
            new_kv["k"], new_kv["v"] = k, v
            kf = _repeat_kv(k, cfg.n_heads // cfg.n_kv_heads)
            vf = _repeat_kv(v, cfg.n_heads // cfg.n_kv_heads)
            ctx = flash_attention_n(
                q, kf, vf,
                softmax_n_param=cfg.softmax_n,
                is_causal=True,
                implementation=cfg.attn_implementation,
            )
            return ctx, None

        x, _, _ = _layer(cfg, (cos, sin), x, lp, attn)
        return x, (new_kv["k"], new_kv["v"])

    layer_ids = jnp.arange(cfg.n_layers)
    x, (k_stack, v_stack) = jax.lax.scan(body, x, (params["layers"], layer_ids))

    cache = dict(cache)
    if _is_quantized_cache(cache):
        from flash_attention_softmax_n_tpu.quant.kv_cache import quantize_kv
        from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

        def write(qt, new):
            bits = 8 if qt.bits == 8 else -8
            values, scales = quantize_kv(new, bits)
            zero5 = (0, 0, 0, 0, 0)
            return QTensor(
                jax.lax.dynamic_update_slice(
                    qt.values, values.astype(qt.values.dtype), zero5),
                jax.lax.dynamic_update_slice(qt.scales, scales, zero5),
                bits=qt.bits,
            )

        cache["k"] = write(cache["k"], k_stack)
        cache["v"] = write(cache["v"], v_stack)
    else:
        cache["k"] = jax.lax.dynamic_update_slice(
            cache["k"], k_stack.astype(cache["k"].dtype), (0, 0, 0, 0, 0))
        cache["v"] = jax.lax.dynamic_update_slice(
            cache["v"], v_stack.astype(cache["v"].dtype), (0, 0, 0, 0, 0))
    cache["length"] = jnp.asarray(l, jnp.int32)

    x = rms_norm(x[:, -1:], params["final_norm"], cfg.norm_eps)
    logits = _mm(x, params["lm_head"], cfg.act_bits,
                 cfg.int8_mm_impl).astype(jnp.float32)
    return logits[:, 0], cache


def _is_quantized_cache(cache: Dict) -> bool:
    from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

    return isinstance(cache["k"], QTensor)


def _cached_attention(cfg: DecoderConfig, q, k_cache, v_cache, length):
    """Single-step attention against the padded cache with softmax-N.

    q (B, H, 1, hd); k/v_cache (B, KVH, S, hd); valid keys are [0, length).
    The +n term rides the softmax_n denominator — masked (padded) positions
    contribute exp(NEG_INF) = 0.
    """
    kf = _repeat_kv(k_cache, cfg.n_heads // cfg.n_kv_heads)
    vf = _repeat_kv(v_cache, cfg.n_heads // cfg.n_kv_heads)
    scores = jnp.einsum("bhle,bhse->bhls", q, kf,
                        preferred_element_type=jnp.float32)
    scores = scores * (cfg.head_dim ** -0.5)
    s = kf.shape[2]
    valid = jnp.arange(s)[None, None, None, :] < length
    scores = jnp.where(valid, scores, NEG_INF)
    probs = softmax_n(scores, n=cfg.softmax_n, axis=-1)
    return jnp.einsum("bhls,bhsv->bhlv", probs.astype(vf.dtype), vf)


def decode_step(params: Dict, cfg: DecoderConfig, token: jax.Array,
                cache: Dict) -> Tuple[jax.Array, Dict]:
    """One greedy-decode step: token (B,) int32 -> (logits (B, V), cache')."""
    b = token.shape[0]
    x = params["embed"][token][:, None].astype(cfg.dtype)  # (B, 1, D)
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    pos = cache["length"]
    positions = jnp.full((b, 1), pos, jnp.int32)

    quantized = _is_quantized_cache(cache)

    def body(x, layer_in):
        lp, k_cache, v_cache = layer_in

        def attn(q, k, v):
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
            if quantized:
                from flash_attention_softmax_n_tpu.quant.kv_cache import (
                    cached_attention_quantized,
                    update_quantized_cache,
                )
                k_new = update_quantized_cache(k_cache, k, pos)
                v_new = update_quantized_cache(v_cache, v, pos)
                ctx = cached_attention_quantized(
                    q, k_new, v_new, pos + 1,
                    softmax_n_param=cfg.softmax_n,
                    scale=cfg.head_dim ** -0.5,
                    compute_dtype=cfg.dtype,
                )
            else:
                k_new = jax.lax.dynamic_update_slice(
                    k_cache, k.astype(k_cache.dtype), (0, 0, pos, 0))
                v_new = jax.lax.dynamic_update_slice(
                    v_cache, v.astype(v_cache.dtype), (0, 0, pos, 0))
                ctx = _cached_attention(cfg, q, k_new, v_new, pos + 1)
            return ctx.astype(x.dtype), (k_new, v_new)

        x, _, (k_new, v_new) = _layer(cfg, (cos, sin), x, lp, attn)
        return x, (k_new, v_new)

    x, (k_stack, v_stack) = jax.lax.scan(
        body, x, (params["layers"], cache["k"], cache["v"]))

    cache = dict(cache)
    cache["k"], cache["v"] = k_stack, v_stack
    cache["length"] = pos + 1

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm(x, params["lm_head"], cfg.act_bits,
                 cfg.int8_mm_impl).astype(jnp.float32)
    return logits[:, 0], cache


def greedy_generate(params: Dict, cfg: DecoderConfig, prompt: jax.Array,
                    max_new_tokens: int,
                    kv_quantization: Optional[str] = None) -> jax.Array:
    """Greedy decoding: prompt (B, L) -> generated tokens (B, max_new_tokens).

    ``kv_quantization``: None, 'int8', or 'fp8' (quantized KV cache decode).
    """
    b, l = prompt.shape
    cache = init_kv_cache(cfg, b, max_len=l + max_new_tokens,
                          quantization=kv_quantization)
    logits, cache = prefill(params, cfg, prompt, cache)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def step(carry, _):
        token, cache = carry
        logits, cache = decode_step(params, cfg, token, cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), token

    (_, _), tokens = jax.lax.scan(step, (first, cache), None,
                                  length=max_new_tokens)
    return tokens.T  # (B, max_new_tokens)
