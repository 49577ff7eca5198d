"""Continuous-batching inference engine for softmax-N decoders.

North-star net-new capability (BASELINE.json: "continuous batching across
hosts"): a slot-based serving engine with TPU-friendly static shapes —

  * a fixed pool of ``max_batch`` sequence slots sharing one preallocated
    KV cache (dense bf16, INT8, or FP8 via quant/kv_cache.py);
  * per-slot lengths/active masks as device vectors (no shape changes,
    no recompilation as requests come and go);
  * admission by BATCHED prefill (same-bucket requests share one weight
    stream, long prompts stream through CHUNKED continuation prefills;
    dispatch-only — the host syncs once per scheduling round, after the
    decode work is already in flight), decode as one batched step — or as
    fused multi-step on-device chunks between scheduling points
    (run_until_done(loop_steps=N), the serving fast path) with budget-
    adaptive chunk lengths;
  * per-slot greedy / temperature / top-k / top-p sampling as (B,) data
    (mixed batches share one executable), EOS + max-token termination;
  * tensor/data-parallel serving over a mesh via parallel/serving.py (the
    cache shards over 'data' slots x 'model' heads).

The request queue and slot bookkeeping are host-side Python (cheap,
asynchronous with device compute); everything per-token is compiled.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
import time
from collections import deque
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.models.decoder import (
    DecoderConfig,
    _layer,
    _mm,
    _repeat_kv,
)
from flash_attention_softmax_n_tpu.models.layers import (
    apply_rope,
    rms_norm,
    rope_frequencies,
)
from flash_attention_softmax_n_tpu.ops.flash_attention import flash_attention_n
from flash_attention_softmax_n_tpu.ops.sampling import sample_tokens
from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

__all__ = ["Request", "InferenceEngine"]

@dataclasses.dataclass
class Request:
    """One generation request (host-side)."""

    request_id: int
    prompt: List[int]
    max_new_tokens: int = 64
    temperature: float = 0.0  # 0 = greedy
    eos_token: Optional[int] = None
    top_k: int = 0       # <= 0 = no k-truncation
    top_p: float = 1.0   # >= 1 = no nucleus truncation
    # filled by the engine:
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _bucket(n: int, buckets=(32, 64, 96, 128, 256, 512, 1024, 2048)) -> int:
    # 96 sits between the two densest serving-prompt buckets: without it,
    # 65-96-token prompts pad 33-97% (measured 26-28% of ALL prefill
    # compute was padding on the mixed 16-128 churn workload)
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


# ----------------------------------------------------------------------------
# compiled model steps (slot-aware: per-slot lengths instead of one scalar)
# ----------------------------------------------------------------------------


def _attention_over_slots(cfg: DecoderConfig, q, k_cache, v_cache, lengths,
                          k_new=None, v_new=None, k_tail=None, v_tail=None,
                          tail_lengths=None):
    """q (B, H, hd) attention over a per-slot-length cache, plus (optionally)
    the CURRENT token's k/v rows (B, KVH, hd) as one extra key each — so the
    step's attention never waits on (or re-reads) the cache write.

    Routing (kernels/decode_attention.py does the work either way): XLA's
    batched-matvec stats everywhere — measured faster than the Pallas
    decode kernel on v5e at every shape tried (short caches are dispatch-
    overhead-bound; at long padded caches XLA's streaming still beats the
    kernel's per-(slot, tile) grid, 1.9ms vs 22ms at b=32/S=2048/GQA-8).
    The Pallas path stays available via decode_attention_n(...,
    implementation="pallas") for shapes where its length-clamped DMA wins.
    """
    from flash_attention_softmax_n_tpu.kernels.decode_attention import (
        decode_attention_n,
    )

    quantized = isinstance(k_cache, QTensor)
    impl = cfg.decode_attn_impl
    kwargs = dict(
        softmax_n_param=cfg.softmax_n, scale=cfg.head_dim ** -0.5,
        k_new=k_new, v_new=v_new, k_tail=k_tail, v_tail=v_tail,
        tail_lengths=tail_lengths, implementation=impl)
    if quantized:
        return decode_attention_n(
            q, k_cache.values, v_cache.values, lengths,
            k_scales=k_cache.scales, v_scales=v_cache.scales, **kwargs)
    return decode_attention_n(q, k_cache, v_cache, lengths, **kwargs)


def engine_prefill_batch(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
                         true_lens: jax.Array, slots: jax.Array,
                         cache: Dict, mesh=None) -> Tuple[jax.Array, Dict]:
    """Prefill ``nb`` slots with (nb, Lb) right-padded prompts in ONE pass.

    Admission is weight-bound (every prefill streams all weights), so
    batching queued requests through one forward amortizes the stream
    across them. Duplicate slot entries are idempotent (the host pads a
    partial admission group by repeating its last request). Returns
    (last-true-token logits (nb, V), cache').

    ``mesh``: serve tensor/data-parallel — the Pallas flash kernel is
    shard_mapped over (batch='data', heads='model') instead of forcing the
    O(L^2)-materializing XLA attention (heads are data-independent, so the
    kernel partitions cleanly; see ops/flash_attention._shard_mapped_fused).

    Exactly the ``offset=0`` case of ``engine_prefill_chunk`` (the
    zero-width prefix gather/concat is elided by XLA).
    """
    return engine_prefill_chunk(params, cfg, tokens, true_lens, slots,
                                cache, offset=0, mesh=mesh)


def engine_prefill_chunk(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
                         true_lens: jax.Array, slots: jax.Array,
                         cache: Dict, *, offset: int,
                         mesh=None) -> Tuple[jax.Array, Dict]:
    """Continuation prefill: write a (nb, C) chunk at column ``offset``.

    Chunked prefill (vLLM-style) for prompts longer than the admission
    chunk: each chunk attends the slots' CACHED prefix rows [0, offset)
    plus itself (causal within the chunk, offset positions/RoPE), so a
    long prompt becomes ceil(len/C) bounded dispatches instead of one
    max_len-sized forward — admission latency is capped and decode chunks
    interleave between prompt chunks. Quantized caches dequantize the
    gathered prefix blockwise (bf16 attention over [0, offset) — strictly
    more accurate than the quantize-then-read decode path).

    Only the final chunk's logits are meaningful (taken at each row's last
    true token, clamped into this chunk). ``offset`` is static: the engine
    compiles at most max_len/C variants, reached only by long traffic.
    """
    nb, c = tokens.shape
    x = params["embed"][tokens].astype(cfg.dtype)
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    positions = offset + jnp.arange(c)
    quantized = isinstance(cache["k"], QTensor)
    reps = cfg.n_heads // cfg.n_kv_heads

    # gather each admitted slot's prefix rows once (nl, nb, KVH, off, hd)
    if offset > 0:
        if quantized:
            pk = (cache["k"].values[:, slots, :, :offset].astype(jnp.float32)
                  * cache["k"].scales[:, slots, :, :offset]).astype(cfg.dtype)
            pv = (cache["v"].values[:, slots, :, :offset].astype(jnp.float32)
                  * cache["v"].scales[:, slots, :, :offset]).astype(cfg.dtype)
        else:
            pk = cache["k"][:, slots, :, :offset]
            pv = cache["v"][:, slots, :, :offset]
    else:
        nl = cfg.n_layers
        pk = jnp.zeros((nl, nb, cfg.n_kv_heads, 0, cfg.head_dim), cfg.dtype)
        pv = pk

    s_total = offset + c
    # prefix keys are always valid (a chunk is only dispatched when
    # true_len > offset); chunk key j is valid iff offset+j < true_len AND
    # causally j <= i for query row i
    key_pos = jnp.arange(s_total)
    valid = key_pos[None, None, :] < true_lens[:, None, None]  # (nb,1,S)
    causal = key_pos[None, :] <= (offset + jnp.arange(c))[:, None]  # (C,S)
    mask = jnp.logical_and(valid, causal[None])[:, None]  # (nb,1,C,S)

    def attn_factory(store):
        def attn(q, k, v):
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
            store["k"], store["v"] = k, v
            kf = _repeat_kv(jnp.concatenate([store.pop("pk"), k], axis=2),
                            reps)
            vf = _repeat_kv(jnp.concatenate([store.pop("pv"), v], axis=2),
                            reps)
            ctx = flash_attention_n(
                q, kf, vf, softmax_n_param=cfg.softmax_n, attn_mask=mask,
                implementation=("xla" if cfg.attn_implementation == "xla"
                                else "auto"),
                mesh=mesh,
            )
            return ctx, None
        return attn

    def body(x, xs):
        lp, pk_l, pv_l = xs
        store = {"pk": pk_l, "pv": pv_l}
        x, _, _ = _layer(cfg, (cos, sin), x, lp, attn_factory(store))
        return x, (store["k"], store["v"])

    x, (k_stack, v_stack) = jax.lax.scan(body, x, (params["layers"], pk, pv))

    cache = dict(cache)

    def write_layer(cache_kv, new_stack):
        if isinstance(cache_kv, QTensor):
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                quantize_kv,
            )
            bits = 8 if cache_kv.bits == 8 else -8
            values, scales = quantize_kv(new_stack, bits)
            vals_out, scls_out = cache_kv.values, cache_kv.scales
            for i in range(nb):
                idx = (0, slots[i], 0, offset, 0)
                vals_out = jax.lax.dynamic_update_slice(
                    vals_out, values[:, i][:, None].astype(vals_out.dtype),
                    idx)
                scls_out = jax.lax.dynamic_update_slice(
                    scls_out, scales[:, i][:, None], idx)
            return QTensor(vals_out, scls_out, bits=cache_kv.bits)
        out = cache_kv
        for i in range(nb):
            out = jax.lax.dynamic_update_slice(
                out, new_stack[:, i][:, None].astype(out.dtype),
                (0, slots[i], 0, offset, 0))
        return out

    cache["k"] = write_layer(cache["k"], k_stack)
    cache["v"] = write_layer(cache["v"], v_stack)
    cache["lengths"] = cache["lengths"].at[slots].set(
        jnp.minimum(true_lens, offset + c))

    # logits at each row's last true token WITHIN this chunk (meaningful
    # on the final chunk only)
    last = jnp.clip(true_lens - offset - 1, 0, c - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)
    x_last = rms_norm(x_last, params["final_norm"], cfg.norm_eps)
    logits = _mm(x_last, params["lm_head"], cfg.act_bits,
                 cfg.int8_mm_impl).astype(jnp.float32)
    return logits[:, 0], cache


def engine_prefill(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
                   true_len: jax.Array, slot: jax.Array,
                   cache: Dict) -> Tuple[jax.Array, Dict]:
    """Prefill ONE slot with a (1, Lb) right-padded prompt.

    Single-request wrapper over ``engine_prefill_batch``; padded positions
    beyond ``true_len`` are masked out of attention and never read later.
    Returns (last-token logits (V,), cache').
    """
    logits, cache = engine_prefill_batch(
        params, cfg, tokens, jnp.reshape(true_len, (1,)),
        jnp.reshape(slot, (1,)), cache)
    return logits[0], cache


def _greedy_fusable(params: Dict, cfg: DecoderConfig, mesh=None,
                    batch: Optional[int] = None) -> bool:
    """Can the greedy sampling ride the lm_head kernel epilogue?

    kernels/quant_matmul.quantized_matmul_argmax: int8 unpacked lm_head,
    no W8A8. The kernel argmaxes the f32 accumulator directly, so tokens
    can differ from the unfused path at near-ties (which round-trips
    logits through bf16 — see quantized_matmul_argmax's docstring); the
    (B, vocab) logits never touch HBM.

    Under ``mesh`` the fused path additionally needs vocab % model-axis
    and batch % data-axis divisibility (the shard_map merge in
    _sharded_lm_head_argmax shards exactly, no padding).
    """
    lm = params["lm_head"]
    ok = (isinstance(lm, QTensor) and lm.bits == 8
          and lm.packed_axis is None and cfg.act_bits != 8)
    if ok and mesh is not None:
        tp = mesh.shape.get("model", 1)
        dp = mesh.shape.get("data", 1)
        ok = (lm.values.shape[1] % tp == 0
              and (batch is None or batch % dp == 0))
    return ok


def _sharded_lm_head_argmax(x: jax.Array, lm: QTensor, mesh) -> jax.Array:
    """Fused greedy sampling under TP: per-shard kernel argmax + merge.

    The lm_head is vocab-sharded on 'model' (sharding.decoder_param_specs),
    so each shard runs quantized_matmul_argmax over its local columns
    (logits never hit HBM), offsets the local index to global vocab
    coordinates, and the shard holding the max logit wins. Tie-break
    matches single-device argmax: the all-gather orders shards by index,
    and jnp.argmax takes the first — i.e. the lowest global column.
    x (B, 1, D), returns (B, 1) int32 global token ids.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
        quantized_matmul_argmax,
    )

    scale_spec = (P(None, "model") if lm.scales.ndim == 2 else P("model"))

    def local(xl, wv, ws):
        idx, val = quantized_matmul_argmax(xl, wv, ws, return_max=True)
        off = jax.lax.axis_index("model") * wv.shape[1]
        gidx = (idx + off).astype(jnp.int32)
        vals = jax.lax.all_gather(val, "model")   # (tp, Bl, 1)
        idxs = jax.lax.all_gather(gidx, "model")
        best = jnp.argmax(vals, axis=0)           # first max -> lowest shard
        return jnp.take_along_axis(idxs, best[None], axis=0)[0]

    return shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None, None), P(None, "model"), scale_spec),
        out_specs=P("data", None),
        axis_names=frozenset({"data", "model"}),
        check_vma=False,  # pallas_call emits vma-less out avals
    )(x, lm.values, lm.scales)


def _decode_step(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
                 cache: Dict, active: jax.Array, *, mesh=None,
                 tail: Optional[Tuple[jax.Array, jax.Array]] = None,
                 tail_index: Optional[jax.Array] = None,
                 tail_lengths: Optional[jax.Array] = None,
                 greedy: bool = False,
                 prefill: Optional[Dict] = None):
    """One decode step for ALL slots: tokens (B,) -> (logits (B, V), cache').

    Step anatomy (decode is HBM-bound; everything here serves that):
      * each layer attends over the UNMODIFIED cache plus the current
        token's k/v as an explicit extra key (the self-term epilogue of
        kernels/decode_attention.py) — no read-after-write on the cache;
      * the new k/v rows of all layers are collected (tiny: NL x B x KVH x
        hd) and written ONCE per step by the aliased in-place Pallas
        scatter (kernels/cache_update.py) — replacing a per-layer XLA
        scatter that rewrote the entire cache every step;
      * lengths advance only for active slots. Inactive slots compute
        garbage rows at position ``lengths[slot]``, which the next
        admission's prefill overwrites.

    ``mesh``: when serving tensor/data-parallel (parallel/serving.py), the
    Pallas cache writes run as ``shard_map`` islands — each shard appends
    its local ('data' slots x 'model' heads) rows with no communication;
    everything else is XLA-SPMD-partitioned as usual.

    ``tail`` mode (the fused loop): new rows go to the (k_tail, v_tail)
    ring buffer at the SHARED ``tail_index`` (batch-size-independent write,
    kernels/cache_update.py tail_append) instead of the per-slot cache
    scatter; attention additionally covers the ``tail_lengths`` valid tail
    rows. The main cache is untouched until the loop's flush.

    ``prefill`` (piggybacked chunked prefill — fused loop only): a dict
    {tokens (G, CS), offset (scalar), true_lens (G,), ring_k/ring_v
    (NL, G, KVH, cap, hd)} of G prompt chunks that ride THIS step's weight
    stream: their rows flatten into the same (1, B + G*CS, d) matmul
    operand as the decode rows (norms/projections/MLP/lm_head all shared —
    at small decode batches the step is weight-streaming bound, so the
    prompt tokens are nearly free), while attention splits: decode rows
    take the cache path above, prompt rows attend their own per-layer ring
    ([0, offset) prior rows + this chunk, causal). Returns the greedy
    token for each prompt's last-true-row as a second output; the loop
    selects the one from the prompt's final chunk as its first token.
    """
    B = tokens.shape[0]
    x = params["embed"][tokens][:, None].astype(cfg.dtype)
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    lengths = cache["lengths"]  # (B,)
    positions = lengths[:, None]  # (B, 1)
    quantized = isinstance(cache["k"], QTensor)
    k_cache, v_cache = cache["k"], cache["v"]

    if prefill is not None:
        G, CS = prefill["tokens"].shape
        reps = cfg.n_heads // cfg.n_kv_heads
        off = prefill["offset"]
        x_p = params["embed"][prefill["tokens"]].astype(cfg.dtype)  # (G,CS,d)
        # one flattened row axis: (1, B + G*CS, d) — every row-wise op
        # (norm, projections, SwiGLU) runs once over decode + prompt rows
        x = jnp.concatenate(
            [x.reshape(1, B, -1), x_p.reshape(1, G * CS, -1)], axis=1)
        pos_p = off + jnp.arange(CS, dtype=lengths.dtype)
        pos_m = jnp.concatenate(
            [lengths, jnp.tile(pos_p, G)])[None]  # (1, B + G*CS)
        cap = prefill["ring_k"].shape[3]
        # prompt-row attention mask over [ring(cap) | chunk(CS)], shared
        # across layers: ring row r valid iff r < off (written by earlier
        # steps) and r < true_len; chunk key j at position off+j valid iff
        # off+j < true_len and causally off+j <= query position
        tl = prefill["true_lens"][:, None, None]  # (G,1,1)
        ring_pos = jnp.arange(cap)
        ring_ok = jnp.logical_and(ring_pos < off, ring_pos < tl)  # (G,1,cap)
        qpos = (off + jnp.arange(CS))[:, None]  # (CS,1)
        kpos = (off + jnp.arange(CS))[None, :]  # (1,CS)
        chunk_ok = jnp.logical_and(kpos <= qpos,
                                   kpos < tl)  # (G,CS,CS)
        p_mask = jnp.concatenate(
            [jnp.broadcast_to(ring_ok, (G, CS, cap)), chunk_ok],
            axis=-1)[:, None]  # (G,1,CS,cap+CS)

    def body(x, layer_in):
        if quantized:
            lp, kv, ks, vv, vs = layer_in[:5]
            rest = layer_in[5:]
            kc = QTensor(kv, ks, bits=k_cache.bits)
            vc = QTensor(vv, vs, bits=v_cache.bits)
        else:
            lp, kc, vc = layer_in[:3]
            rest = layer_in[3:]
        if prefill is not None:
            rk_l, rv_l = rest[-2:]
            rest = rest[:-2]
        kt, vt = rest if tail is not None else (None, None)

        def attn(q, k, v):
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
            ctx = _attention_over_slots(
                cfg, q[:, :, 0], kc, vc, lengths_main,
                k_new=k[:, :, 0], v_new=v[:, :, 0],
                k_tail=kt, v_tail=vt, tail_lengths=tail_lengths)
            return ctx[:, :, None, :].astype(x.dtype), (k[:, :, 0], v[:, :, 0])

        def attn_mixed(q, k, v):
            # q (1,H,M,hd), k/v (1,KVH,M,hd): one rope over the combined
            # row axis (decode rows at their cache lengths, prompt rows at
            # off+j), then the two attention structures split
            from flash_attention_softmax_n_tpu.ops.functional import (
                softmax_n,
            )
            nh = q.shape[1]
            q = apply_rope(q, cos, sin, pos_m)
            k = apply_rope(k, cos, sin, pos_m)
            qd = jnp.swapaxes(q[0, :, :B], 0, 1)  # (B,H,hd)
            kd = jnp.swapaxes(k[0, :, :B], 0, 1)
            vd = jnp.swapaxes(v[0, :, :B], 0, 1)
            ctx_d = _attention_over_slots(
                cfg, qd, kc, vc, lengths_main, k_new=kd, v_new=vd,
                k_tail=kt, v_tail=vt, tail_lengths=tail_lengths)
            qp = q[0, :, B:].reshape(nh, G, CS, -1).transpose(1, 0, 2, 3)
            kp = k[0, :, B:].reshape(cfg.n_kv_heads, G, CS,
                                     -1).transpose(1, 0, 2, 3)
            vp = v[0, :, B:].reshape(cfg.n_kv_heads, G, CS,
                                     -1).transpose(1, 0, 2, 3)
            keys = jnp.concatenate([rk_l, kp.astype(rk_l.dtype)], axis=2)
            vals = jnp.concatenate([rv_l, vp.astype(rv_l.dtype)], axis=2)
            s = jnp.einsum("ghqe,ghse->ghqs", qp, _repeat_kv(keys, reps),
                           preferred_element_type=jnp.float32)
            s = s * (cfg.head_dim ** -0.5)
            s = jnp.where(p_mask, s, jnp.float32(-1e30))
            pw = softmax_n(s, n=cfg.softmax_n, axis=-1)
            ctx_p = jnp.einsum(
                "ghqs,ghse->ghqe", pw,
                _repeat_kv(vals, reps).astype(jnp.float32))
            ctx_m = jnp.concatenate(
                [jnp.swapaxes(ctx_d, 0, 1),
                 ctx_p.transpose(1, 0, 2, 3).reshape(nh, G * CS, -1)],
                axis=1)[None]
            return ctx_m.astype(x.dtype), ((kd, vd), (kp, vp))

        x, _, rows = _layer(cfg, (cos, sin), x, lp,
                            attn if prefill is None else attn_mixed)
        return x, rows

    # in tail mode, the cache only holds the pre-loop prefix: rows past the
    # loop entry live in the tail, so the main-cache attention span is
    # lengths - tail_lengths
    lengths_main = lengths if tail is None else lengths - tail_lengths

    if quantized:
        xs = (params["layers"], k_cache.values, k_cache.scales,
              v_cache.values, v_cache.scales)
    else:
        xs = (params["layers"], k_cache, v_cache)
    if tail is not None:
        xs = xs + (tail[0], tail[1])
    if prefill is not None:
        xs = xs + (prefill["ring_k"], prefill["ring_v"])
        x, ((k_rows, v_rows), (kp_rows, vp_rows)) = jax.lax.scan(
            body, x, xs)
        # prompt-chunk rows land in the per-layer ring at this step's
        # static-width offset — ONE contiguous update per step
        new_ring = (
            jax.lax.dynamic_update_slice(
                prefill["ring_k"], kp_rows.astype(prefill["ring_k"].dtype),
                (0, 0, 0, prefill["offset"], 0)),
            jax.lax.dynamic_update_slice(
                prefill["ring_v"], vp_rows.astype(prefill["ring_v"].dtype),
                (0, 0, 0, prefill["offset"], 0)))
    else:
        x, (k_rows, v_rows) = jax.lax.scan(body, x, xs)
    # k_rows/v_rows: (NL, B, KVH, hd) bf16 — the step's new cache rows

    from flash_attention_softmax_n_tpu.kernels.cache_update import (
        cache_append,
        tail_append,
    )

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        c_sp = P(None, "data", "model", None, None)
        n_sp = P(None, "data", "model", None)

        def _append(caches, news, pos):
            n = len(caches)
            return shard_map(
                cache_append, mesh=mesh,
                in_specs=((c_sp,) * n, (n_sp,) * n, P("data")),
                out_specs=(c_sp,) * n,
                check_vma=False,
            )(caches, news, pos)

        def _tappend(kt, vt, kn, vn, idx):
            return shard_map(
                tail_append, mesh=mesh,
                in_specs=(c_sp, c_sp, n_sp, n_sp, P()),
                out_specs=(c_sp, c_sp),
                check_vma=False,
            )(kt, vt, kn, vn, idx)
    else:
        _append = cache_append
        _tappend = tail_append

    cache = dict(cache)
    if tail is not None:
        new_tail = _tappend(tail[0], tail[1], k_rows.astype(tail[0].dtype),
                            v_rows.astype(tail[1].dtype), tail_index)
    else:
        new_tail = None
        write_pos = jnp.minimum(lengths, (k_cache.values if quantized
                                          else k_cache).shape[3] - 1)
        if quantized:
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                quantize_kv,
            )

            bits = 8 if k_cache.bits == 8 else -8
            kq, kqs = quantize_kv(k_rows[:, :, :, None, :], bits)
            vq, vqs = quantize_kv(v_rows[:, :, :, None, :], bits)
            kv_out, ks_out, vv_out, vs_out = _append(
                (k_cache.values, k_cache.scales,
                 v_cache.values, v_cache.scales),
                (kq[:, :, :, 0].astype(k_cache.values.dtype),
                 kqs[:, :, :, 0],
                 vq[:, :, :, 0].astype(v_cache.values.dtype),
                 vqs[:, :, :, 0]),
                write_pos)
            cache["k"] = QTensor(kv_out, ks_out, bits=k_cache.bits)
            cache["v"] = QTensor(vv_out, vs_out, bits=v_cache.bits)
        else:
            cache["k"], cache["v"] = _append(
                (k_cache, v_cache),
                (k_rows.astype(k_cache.dtype), v_rows.astype(v_cache.dtype)),
                write_pos)

    cache["lengths"] = jnp.where(active, lengths + 1, lengths)

    if prefill is not None:
        # decode rows + each prompt's last-true-row THIS chunk (meaningful
        # only on its final chunk — the loop selects that one) through one
        # shared final-norm + fused argmax lm_head
        from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
            quantized_matmul_argmax,
        )
        xd = x[0, :B][:, None]  # (B,1,d)
        xp = x[0, B:].reshape(G, CS, -1)
        last = jnp.clip(prefill["true_lens"] - prefill["offset"] - 1,
                        0, CS - 1)
        xg = jnp.take_along_axis(xp, last[:, None, None], axis=1)  # (G,1,d)
        xx = rms_norm(jnp.concatenate([xd, xg], axis=0),
                      params["final_norm"], cfg.norm_eps)
        if _greedy_fusable(params, cfg, None, xx.shape[0]):
            lm = params["lm_head"]
            tok = quantized_matmul_argmax(xx, lm.values, lm.scales)
        else:
            logits = _mm(xx, params["lm_head"], cfg.act_bits,
                         cfg.int8_mm_impl).astype(jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (tok[:B, 0], tok[B:, 0]), cache, new_tail, new_ring

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    if greedy and _greedy_fusable(params, cfg, mesh, tokens.shape[0]):
        from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
            quantized_matmul_argmax,
        )
        lm = params["lm_head"]
        if mesh is not None:
            tok = _sharded_lm_head_argmax(x, lm, mesh)
        else:
            tok = quantized_matmul_argmax(x, lm.values, lm.scales)
        return tok[:, 0], cache, new_tail  # (B,) int32 greedy tokens
    logits = _mm(x, params["lm_head"], cfg.act_bits,
                 cfg.int8_mm_impl).astype(jnp.float32)
    return logits[:, 0], cache, new_tail


def engine_decode(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
                  cache: Dict, active: jax.Array,
                  mesh=None) -> Tuple[jax.Array, Dict]:
    """One decode step for ALL slots: tokens (B,) -> (logits (B, V), cache').

    See ``_decode_step`` for the step anatomy; this public wrapper is the
    per-slot-scatter (non-tail) variant used by the host-driven engine.
    """
    logits, cache, _ = _decode_step(params, cfg, tokens, cache, active,
                                    mesh=mesh)
    return logits, cache


def engine_decode_loop(params: Dict, cfg: DecoderConfig, tokens: jax.Array,
                       cache: Dict, active: jax.Array, *, num_steps: int,
                       eos_token: Optional[int] = None,
                       temperature: float = 0.0,
                       rng: Optional[jax.Array] = None,
                       temps: Optional[jax.Array] = None,
                       top_k: Optional[jax.Array] = None,
                       top_p: Optional[jax.Array] = None,
                       mesh=None,
                       attn_len: Optional[int] = None,
                       p_tokens: Optional[jax.Array] = None,
                       p_slots: Optional[jax.Array] = None,
                       p_true_lens: Optional[jax.Array] = None,
                       ) -> Tuple[jax.Array, Dict, jax.Array]:
    """``num_steps`` fused decode steps in ONE compiled program.

    The per-step host round-trip of calling ``engine_decode`` from Python is
    pure dispatch overhead (and, without buffer donation, a full KV-cache
    copy per step); serving engines only need the host between scheduling
    points. This runs the sample-feedback loop on device via ``lax.scan``:
    greedy (or temperature) sampling, optional EOS deactivation, per-slot
    length advance only while active.

    Returns ``(tokens_out (B, num_steps), cache', active')``. Slots that hit
    EOS keep emitting their last token; callers truncate by ``active`` flips.

    Tail-window mode (default for num_steps >= 8): inside the loop, new k/v
    rows append to a bf16 ring buffer at the loop's SHARED step index (a
    batch-size-independent in-place write) and attention covers
    cache-prefix + tail + current token; ONE flush per loop scatters the
    whole window into the main cache (quantizing it for quantized caches).
    This replaces num_steps per-slot scatters — the dominant per-step cost
    at batch >= 16 — with one. Requires ``lengths + round_up(num_steps, 8)
    <= max_len`` for every active slot (the engine's admission contract;
    violating it would let the flush's clamped update corrupt earlier
    rows). Numerics note:
    within-window keys are attended in bf16 even for quantized caches
    (strictly more accurate; they are quantized at flush).

    ``attn_len`` (static, tail mode only): attention reads only the first
    ``attn_len`` cache rows. The XLA decode attention streams the FULL
    padded cache every step (masking after the fact), so at serving
    lengths well below max_len most of that HBM traffic is padding; the
    host scheduler knows max(lengths) and passes a (bucketed, so the jit
    cache stays small) bound. Exact because in tail mode the main-cache
    attention span is frozen at the loop-entry lengths: rows past
    ``attn_len >= max(active lengths)`` are masked for every slot anyway.
    The tail flush still writes through the full cache.

    Piggybacked admission (``p_tokens (G, cap)`` right-padded prompts,
    ``p_slots (G,)``, ``p_true_lens (G,)``; requires tail mode, greedy
    decode, no mesh, cap % num_steps == 0): each step prefills a
    cap/num_steps-token chunk of every prompt THROUGH the decode step's
    matmuls (see ``_decode_step`` ``prefill``), so admission stops paying
    its own weight streams and prefill/decode stop serializing on device.
    Prompt rows collect in a bf16 ring flushed into the cache (quantizing)
    after the decode-tail flush — piggybacked slots MUST be inactive in
    ``active`` (their decode-tail garbage rows land at base 0 and are
    overwritten by this flush). Returns (tokens, cache, active,
    first_tokens (G,)) — each prompt's greedy first token, selected at its
    final chunk; the slots start decoding from it next loop.
    """
    # ``temps`` (B,) enables per-slot sampling entirely on-device: slots
    # with temp 0 take argmax, temp > 0 sample, and (B,) ``top_k``/``top_p``
    # add truncation — all DATA, so mixed batches share one executable and
    # never leave the fused loop. ``temperature`` (scalar, whole-batch)
    # remains for the sharded-decode API.
    sampling = temperature > 0.0 or temps is not None
    if sampling and rng is None:
        raise ValueError("temperature sampling requires rng")

    quantized = isinstance(cache["k"], QTensor)
    kc = cache["k"].values if quantized else cache["k"]
    nl, bsz, kvh, s_len, hd = kc.shape
    use_tail = num_steps >= 8

    if use_tail:
        w = -(-num_steps // 8) * 8
        tail0 = (jnp.zeros((nl, bsz, kvh, w, hd), cfg.dtype),
                 jnp.zeros((nl, bsz, kvh, w, hd), cfg.dtype))
        base = cache["lengths"]

    k_full, v_full = cache["k"], cache["v"]
    if use_tail and attn_len is not None and attn_len < s_len:
        def _window(c):
            if isinstance(c, QTensor):
                return QTensor(c.values[:, :, :, :attn_len],
                               c.scales[:, :, :, :attn_len], bits=c.bits,
                               packed_axis=c.packed_axis)
            return c[:, :, :, :attn_len]

        cache = dict(cache, k=_window(cache["k"]), v=_window(cache["v"]))

    # greedy rides the lm_head kernel epilogue; under mesh the vocab-sharded
    # argmaxes merge across shards (_sharded_lm_head_argmax)
    greedy = not sampling and _greedy_fusable(params, cfg, mesh,
                                              tokens.shape[0])

    piggy = p_tokens is not None
    if piggy:
        if not use_tail or sampling or mesh is not None:
            raise ValueError(
                "piggybacked prefill requires tail mode, greedy decode, "
                "and no mesh")
        G, cap = p_tokens.shape
        if cap % num_steps:
            raise ValueError(f"piggyback cap {cap} must divide into "
                             f"{num_steps} steps")
        CS = cap // num_steps
        ring0 = (jnp.zeros((nl, G, kvh, cap, hd), cfg.dtype),
                 jnp.zeros((nl, G, kvh, cap, hd), cfg.dtype))
        # each prompt's final chunk index: the step whose chunk contains
        # row true_len-1
        p_final = jnp.maximum(p_true_lens - 1, 0) // CS  # (G,)

    def make_step():
        def step(carry, xs):
            i, key = xs
            if piggy:
                tok, cache, active, tail, ring, first = carry
            else:
                tok, cache, active, tail = carry
            if piggy:
                chunk_toks = jax.lax.dynamic_slice(
                    p_tokens, (0, i * CS), (G, CS))
                pf = {"tokens": chunk_toks, "offset": i * CS,
                      "true_lens": p_true_lens,
                      "ring_k": ring[0], "ring_v": ring[1]}
                (out, p_tok), cache, tail, ring = _decode_step(
                    params, cfg, tok, cache, active, mesh=mesh, tail=tail,
                    tail_index=i, tail_lengths=cache["lengths"] - base,
                    greedy=True, prefill=pf)
                first = jnp.where(i == p_final, p_tok, first)
            elif use_tail:
                out, cache, tail = _decode_step(
                    params, cfg, tok, cache, active, mesh=mesh, tail=tail,
                    tail_index=i, tail_lengths=cache["lengths"] - base,
                    greedy=greedy)
            else:
                out, cache, _ = _decode_step(params, cfg, tok, cache, active,
                                             mesh=mesh, greedy=greedy)
            if piggy or greedy:
                nxt = out  # argmax fused into the lm_head kernel epilogue
            elif temps is not None:
                nxt = sample_tokens(out, key, temps, top_k, top_p)
            elif temperature > 0.0:
                nxt = jax.random.categorical(
                    key, out / temperature, axis=-1).astype(jnp.int32)
            else:
                nxt = jnp.argmax(out, axis=-1).astype(jnp.int32)
            nxt = jnp.where(active, nxt, tok)
            if eos_token is not None:
                active = jnp.logical_and(active, nxt != eos_token)
            if piggy:
                return (nxt, cache, active, tail, ring, first), nxt
            return (nxt, cache, active, tail), nxt
        return step

    keys = (jax.random.split(rng, num_steps) if sampling
            else jnp.zeros((num_steps, 2), jnp.uint32))
    carry = (tokens, cache, active, tail0 if use_tail else None)
    if piggy:
        carry = carry + (ring0, jnp.zeros((G,), jnp.int32))
    # NOTE (measured, v5e b=512): sub-chunking this scan so each chunk's
    # attention reads a growing static view of the tail ring (16 or 32
    # steps per sub-scan) LOSES ~5-9% end-to-end — the sub-scan boundary
    # overhead outweighs the skipped not-yet-written tail rows. One scan
    # over the full ring wins.
    carry, toks = jax.lax.scan(
        make_step(), carry,
        (jnp.arange(num_steps, dtype=jnp.int32), keys))
    if piggy:
        tok, cache, active, tail, ring, first_toks = carry
    else:
        tok, cache, active, tail = carry

    if use_tail:
        cache = dict(cache)
        cache["k"], cache["v"] = _flush_tail(
            cfg, k_full, v_full, tail[0], tail[1], base)
    if piggy:
        # prompt rows into the cache AFTER the tail flush: piggybacked
        # slots' decode-tail garbage landed at base 0 and must lose
        cache["k"], cache["v"] = _flush_prefill_ring(
            cache["k"], cache["v"], ring[0], ring[1], p_slots)
        cache["lengths"] = cache["lengths"].at[p_slots].set(
            jnp.minimum(p_true_lens, s_len).astype(cache["lengths"].dtype))
        return jnp.swapaxes(toks, 0, 1), cache, active, first_toks
    return jnp.swapaxes(toks, 0, 1), cache, active


def _flush_prefill_ring(k_cache, v_cache, ring_k, ring_v, p_slots):
    """Scatter piggybacked prompt rows (NL, G, KVH, cap, hd) into the main
    cache at row 0 of each prompt's slot, quantizing for quantized caches.

    One dynamic_update_slice per (real or duplicate-padding) prompt —
    duplicates write identical data, so order is irrelevant. Rows past a
    prompt's true length are garbage but sit at positions >= the slot's
    lengths entry, which attention never reads and later admissions
    overwrite (the same rule as the decode-tail flush)."""
    quantized = isinstance(k_cache, QTensor)
    g_total = ring_k.shape[1]

    def write(dst, rows):
        # dst (NL, B, KVH, S, D); rows (NL, G, KVH, cap, D)
        for g in range(g_total):
            dst = jax.lax.dynamic_update_slice(
                dst, rows[:, g][:, None].astype(dst.dtype),
                (0, p_slots[g], 0, 0, 0))
        return dst

    if quantized:
        from flash_attention_softmax_n_tpu.quant.kv_cache import quantize_kv

        bits = 8 if k_cache.bits == 8 else -8
        kq, kqs = quantize_kv(ring_k, bits)
        vq, vqs = quantize_kv(ring_v, bits)
        k_out = QTensor(write(k_cache.values, kq), write(k_cache.scales, kqs),
                        bits=k_cache.bits)
        v_out = QTensor(write(v_cache.values, vq), write(v_cache.scales, vqs),
                        bits=v_cache.bits)
        return k_out, v_out
    return write(k_cache, ring_k), write(v_cache, ring_v)


# fused-flush safe envelope in (slots x window-rows): the largest product
# the one-shot flush is MEASURED to compile at on v5e (b768/w64; b896/w64
# dies in the compile helper — artifacts/b1024_bisect.json)
_FLUSH_SPLIT_ENVELOPE = 768 * 64


def _flush_tail(cfg: DecoderConfig, k_cache, v_cache, k_tail, v_tail, base):
    """Scatter the loop's tail window into the main cache.

    One vmapped contiguous-span dynamic_update_slice per slot (a single
    full-cache rewrite, amortized over the whole loop). Rows beyond a
    slot's advanced length are garbage but land at positions >= lengths,
    which attention never reads and the next admission overwrites.
    Quantized caches quantize the window here (per-row scales).

    If a slot's window would run past the cache end (a violation of the
    loop's admission contract), the write is shifted-and-masked so earlier
    rows are never corrupted: overflowing tail rows are dropped instead.
    """
    quantized = isinstance(k_cache, QTensor)

    def write_span(c, t, b0):
        # c (KVH, S, D), t (KVH, W, D): write t at row b0 of one slot.
        # DUS clamps start indices; guard against b0 + W > S shifting the
        # window onto earlier valid rows by merging the clamped span.
        w = t.shape[1]
        s = c.shape[1]
        start = jnp.minimum(b0, s - w)
        shift = b0 - start  # 0 when the contract holds
        cur = jax.lax.dynamic_slice(
            c, (0, start, 0), (c.shape[0], w, c.shape[2]))
        tp = jnp.pad(t, ((0, 0), (w, 0), (0, 0)))
        t_shift = jax.lax.dynamic_slice(tp, (0, w - shift, 0), t.shape)
        rows = jnp.arange(w)[None, :, None]
        merged = jnp.where(rows >= shift, t_shift.astype(c.dtype), cur)
        return jax.lax.dynamic_update_slice(c, merged, (0, start, 0))

    vslots = jax.vmap(write_span, in_axes=(0, 0, 0))  # over slots (B, ...)

    bsz, w = k_tail.shape[1], k_tail.shape[3]
    # The flush's full-tensor temporaries (f32 quantize intermediates +
    # the padded/merged spans, each ~(NL, B, KVH, W, D)) kill the Mosaic
    # compile helper past ~1.1 GB: b768/w64 compiles, b896/w64 dies with
    # the opaque HTTP-500 (artifacts/b1024_bisect.json, round 5). Above
    # the measured-safe envelope the flush runs LAYER-BY-LAYER via
    # lax.map — intermediates shrink by NL and the large-batch loops
    # (b >= 896) compile; at and below the envelope the single fused
    # flush is kept unchanged.
    split = bsz * w > _FLUSH_SPLIT_ENVELOPE

    def flush_pair(cache_arr, tail):
        """cache_arr (NL,B,KVH,S,D[=1 for scales]) <- tail (NL,B,KVH,W,D'),
        quantizing the tail per layer when the cache is quantized."""
        if quantized:
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                quantize_kv,
            )
            bits = 8 if cache_arr.bits == 8 else -8

            def layer(args):
                cv, cs, t = args
                tq, ts = quantize_kv(t, bits)
                return vslots(cv, tq, base), vslots(cs, ts, base)

            ops = (cache_arr.values, cache_arr.scales, tail)
            if split:
                nv, ns = jax.lax.map(layer, ops)
            else:
                nv, ns = jax.vmap(layer)(ops)
            return QTensor(nv, ns, bits=cache_arr.bits)

        def layer(args):
            c, t = args
            return vslots(c, t, base)

        ops = (cache_arr, tail)
        return (jax.lax.map(layer, ops) if split
                else jax.vmap(layer)(ops))

    return flush_pair(k_cache, k_tail), flush_pair(v_cache, v_tail)


# ----------------------------------------------------------------------------
# host-side engine
# ----------------------------------------------------------------------------


class InferenceEngine:
    """Slot-based continuous-batching engine.

    Usage::

        eng = InferenceEngine(cfg, params, max_batch=8, max_len=2048,
                              kv_quantization='int8')
        rid = eng.submit([1, 2, 3], max_new_tokens=32)
        finished = eng.run_until_done()   # or step() in a serving loop
    """

    def __init__(self, cfg: DecoderConfig, params: Dict, *,
                 max_batch: int = 8, max_len: Optional[int] = None,
                 kv_quantization: Optional[str] = None,
                 pad_token: int = 0, mesh=None,
                 prefill_chunk: int = 256,
                 piggyback_prefill: bool = True):
        """``mesh``: a jax Mesh with 'data' and 'model' axes — the engine
        then serves tensor/data-parallel (weights Megatron-sharded, slots +
        cache on 'data'; see parallel/serving.py). max_batch must divide by
        the data-axis size and n_kv_heads by the model-axis size.

        ``prefill_chunk``: prompts longer than this admit via CHUNKED
        prefill (engine_prefill_chunk) — bounded per-dispatch admission
        work instead of one max_len-sized forward; at most
        max_len/prefill_chunk compiled continuation shapes."""
        self.cfg = cfg
        self.mesh = mesh
        self.params = params
        self.max_batch = max_batch
        self.piggyback_prefill = piggyback_prefill
        self.max_len = max_len or cfg.max_seq_len
        self.pad_token = pad_token
        self._CHUNK = prefill_chunk
        # piggyback shape knobs: env read at CONSTRUCTION (not import), so
        # experiments can set FASN_PIGGY_* per engine without mutating
        # engines built earlier in the process; plain attribute assignment
        # after construction also works
        self._PIGGY_CAP = int(os.environ.get("FASN_PIGGY_CAP",
                                             str(self._PIGGY_CAP)))
        self._PIGGY_G = int(os.environ.get("FASN_PIGGY_G",
                                           str(self._PIGGY_G)))
        # admission group width: requests prefilled per batched dispatch.
        # Wider groups amortize the weight stream over more prompt rows
        # (M = group x bucket on the MXU — the int8 matmul probe puts
        # M=2048 far above M=1024) at the cost of more padding when
        # traffic trickles; {2, 4, ..., _ADMIT_G} widths each compile
        # once. Default 16 since round 5: halving the admission dispatch
        # count measured churn192 4850 -> 8191 tok/s on a
        # degraded-latency link (admit_sync 197 -> 66 ms/round) and the
        # wider prefill M only helps the MXU; flood traffic fills groups
        # so pad waste is unchanged.
        self._ADMIT_G = int(os.environ.get("FASN_ADMIT_G", "16"))
        self._id_gen = itertools.count()
        self.queue: deque[Request] = deque()
        self.slots: List[Optional[Request]] = [None] * max_batch
        self._slot_budget = [0] * max_batch  # remaining new tokens per slot
        import numpy as _np
        self._next_host = _np.zeros((max_batch,), _np.int32)
        # host mirror of cache['lengths'] for scheduling: exact for live
        # slots (admission sets it, every chunk/step advances it), so the
        # scheduler never blocks on a device round-trip to plan the next
        # chunk — the decode dispatch can overlap the in-flight prefills
        self._lengths_host = _np.zeros((max_batch,), _np.int64)
        self._next_token = jnp.zeros((max_batch,), jnp.int32)
        self._rng = jax.random.PRNGKey(0)
        # per-phase wall-clock accounting of the fused serving loop —
        # answers "where does end-to-end churn time go" (dispatch phases
        # should be ~free; the syncs are where serialization hides)
        self.phase_times: Dict[str, float] = {}
        self.phase_counts: Dict[str, int] = {}
        # per-chunk (steps, iteration wall-clock) log since last
        # profile_report reset — lets callers detect link-stall outliers at
        # chunk granularity (a single multi-second relay freeze inside an
        # otherwise-healthy wave; see bench.py churn stall handling)
        self.chunk_log: List[Tuple[int, float]] = []
        # scheduling-efficiency counters (host-side increments, ~free):
        # how much prefill compute is padding and how much fused-chunk
        # capacity produces kept tokens — the two churn-loss channels
        self.counters: Dict[str, int] = {}
        # slots reserved for piggybacked prefill in the in-flight chunk
        # (slot -> Request); they are NOT in self.slots until their first
        # token is back, so chunk planning/active masks skip them and
        # classic admission can't reuse them
        self._pending_prefill: Dict[int, Request] = {}
        # prefix cache (round 4): registered shared-prompt prefixes live in
        # detached KV stores; admission copies store rows into a hit's slot
        # and prefills only the suffix (register_prefix / _match_prefix)
        self._kv_quantization = kv_quantization
        self._prefixes: List[Dict] = []
        self._prefix_inserts: Dict = {}

        if jax.default_backend() == "tpu" and mesh is None:
            # pre-flight HBM fence (single-chip only — a mesh divides the
            # cache/weights across devices): past ~12.5 GB resident the
            # Mosaic compile helper crashes with an opaque HTTP 500
            # instead of an OOM (utils/profiling.check_decode_hbm_fit)
            from flash_attention_softmax_n_tpu.utils.profiling import (
                check_decode_hbm_fit,
                pytree_bytes,
            )
            check_decode_hbm_fit(cfg, max_batch, self.max_len,
                                 kv_quantization, pytree_bytes(params))

        if kv_quantization is not None:
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                init_quantized_kv_cache,
            )
            self.cache = init_quantized_kv_cache(
                cfg.n_layers, max_batch, cfg.n_kv_heads, self.max_len,
                cfg.head_dim, mode=kv_quantization)
        else:
            shape = (cfg.n_layers, max_batch, cfg.n_kv_heads, self.max_len,
                     cfg.head_dim)
            self.cache = {"k": jnp.zeros(shape, cfg.dtype),
                          "v": jnp.zeros(shape, cfg.dtype)}
        self.cache["lengths"] = jnp.zeros((max_batch,), jnp.int32)
        self.cache.pop("length", None)

        if mesh is not None:
            from flash_attention_softmax_n_tpu.parallel.serving import (
                shard_engine_state,
            )
            self.params, self.cache = shard_engine_state(
                self.params, self.cache, mesh)

        # cache donation keeps admission/decode updates in place — without
        # it every prefill/step copies the whole KV cache
        self._prefill = jax.jit(
            partial(engine_prefill_batch, cfg=cfg, mesh=mesh),
            donate_argnames=("cache",))
        self._decode = jax.jit(partial(engine_decode, cfg=cfg, mesh=mesh),
                               donate_argnames=("cache",))

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: List[int], max_new_tokens: int = 64,
               temperature: float = 0.0,
               eos_token: Optional[int] = None,
               top_k: int = 0, top_p: float = 1.0) -> int:
        if len(prompt) + max_new_tokens > self.max_len:
            raise ValueError("prompt + max_new_tokens exceeds engine max_len")
        if temperature == 0.0 and (top_k > 0 or top_p < 1.0):
            # greedy rows bypass truncation entirely (ops/sampling.py):
            # reject rather than silently ignore the caller's warpers
            raise ValueError(
                "top_k/top_p require temperature > 0 (temperature=0 is "
                "greedy argmax and ignores truncation)")
        req = Request(next(self._id_gen), list(prompt), max_new_tokens,
                      temperature, eos_token, top_k=top_k, top_p=top_p)
        self.queue.append(req)
        return req.request_id

    def step(self) -> List[Request]:
        """Admit queued requests into free slots, run one decode step.

        Returns requests that finished during this step.
        """
        finished = self._admit()
        active_slots = [i for i, r in enumerate(self.slots) if r is not None]
        if not active_slots:
            return finished

        active = jnp.asarray(
            [r is not None for r in self.slots], dtype=bool)
        logits, self.cache = self._decode(
            params=self.params, tokens=self._next_token, cache=self.cache,
            active=active)
        next_tokens = self._sample(logits, self.slots)

        next_host = jax.device_get(next_tokens)
        for i in active_slots:
            self._lengths_host[i] += 1
            req = self.slots[i]
            tok = int(next_host[i])
            req.output.append(tok)
            self._slot_budget[i] -= 1
            if (self._slot_budget[i] <= 0
                    or (req.eos_token is not None and tok == req.eos_token)):
                req.done = True
                finished.append(req)
                self.slots[i] = None
            else:
                self._next_host[i] = tok
        self._next_token = jnp.asarray(self._next_host)
        return finished

    def run_until_done(self, max_steps: int = 100_000,
                       loop_steps: Optional[int] = None) -> List[Request]:
        """Drive all queued requests to completion.

        ``loop_steps``: decode in fused on-device chunks of that many steps
        between scheduling points (the serving fast path — removes the
        per-token host round-trip). Mixed per-slot sampling settings
        (temperature / top-k / top-p) stay on the fused loop — they are
        (B,) data arrays, not compile-time structure. Falls back to
        per-step decoding only when a slot is too close to ``max_len``
        for a full chunk.

        ``max_steps`` bounds total decode-step *work*: a fused chunk counts
        as its full length even if slots finish mid-chunk (chunks adapt
        down toward the soonest-finishing slot's budget, _chunk_steps), and
        admission-only iterations count as one step — so the loop always
        terminates after at most ``max_steps`` accounting units.
        """
        done = []
        steps_left = max_steps
        tic = time.perf_counter

        def _t(phase, t0):
            dt = tic() - t0
            self.phase_times[phase] = self.phase_times.get(phase, 0.0) + dt
            self.phase_counts[phase] = self.phase_counts.get(phase, 0) + 1
            return tic()

        while steps_left > 0:
            if loop_steps is not None:
                # dispatch order is the overlap: prefills launch, the
                # decode chunk launches right behind them (device-side
                # dependency through the donated cache), and only THEN
                # does the host sync on either — admission cost hides
                # under the chunk's dispatch window
                t0 = it0 = tic()
                piggy = None
                if any(s is not None for s in self.slots):
                    # piggyback selection runs BEFORE classic admission so
                    # eligible queued prompts ride the chunk's weight
                    # stream instead of paying their own prefill; classic
                    # admission then fills whatever slots remain
                    piggy = self._take_piggyback(
                        self._fused_chunk_len(loop_steps))
                pending = self._admit_async()
                t0 = _t("admit_dispatch", t0)
                if not any(s is not None for s in self.slots):
                    done.extend(self._finalize_admission(pending))
                    _t("admit_sync", t0)
                    if not self.queue:
                        break
                    steps_left -= 1  # admission-only iteration still counts
                    continue
                chunk = self._fused_chunk_len(loop_steps)
                t0 = _t("chunk_plan", t0)
                if piggy is not None and not (
                        chunk and chunk <= self._PIGGY_CAP
                        and self._PIGGY_CAP % chunk == 0):
                    # admission changed the plan to a chunk the payload
                    # can't split into; put the prompts back untouched
                    self._undo_piggyback(piggy)
                    piggy = None
                if chunk:
                    handle = self._dispatch_chunk(chunk, piggy)
                    t0 = _t("chunk_dispatch", t0)
                    done.extend(self._finalize_admission(pending))
                    t0 = _t("admit_sync", t0)
                    boundary_s = t0 - it0
                    done.extend(self._finalize_chunk(handle))
                    t_end = _t("chunk_sync", t0)
                    self.chunk_log.append((chunk, t_end - it0))
                    self._update_sched_ewma(boundary_s,
                                            (t_end - t0) / chunk)
                    steps_left -= chunk
                    continue
                done.extend(self._finalize_admission(pending))
                _t("admit_sync", t0)
            done.extend(self.step())
            steps_left -= 1
            if not self.queue and all(s is None for s in self.slots):
                break
        return done

    def profile_report(self, reset: bool = True) -> Dict[str, Dict]:
        """Per-phase wall-clock of the fused serving loop since the last
        reset: {phase: {'total_s', 'count', 'mean_ms'}}. Phases:
        admit_dispatch (host scheduling + prefill launches, no sync),
        chunk_plan (host-only chunk sizing), chunk_dispatch (decode-loop
        launch, no sync), admit_sync (first-token sync of this round's
        prefills), chunk_sync (device_get of the chunk's tokens +
        bookkeeping). Healthy overlap = the two dispatch phases near zero
        and chunk_sync dominated by actual device compute."""
        rep = {k: {"total_s": v, "count": self.phase_counts.get(k, 0),
                   "mean_ms": v / max(self.phase_counts.get(k, 1), 1) * 1e3}
               for k, v in sorted(self.phase_times.items())}
        if reset:
            self.phase_times = {}
            self.phase_counts = {}
            self.chunk_log = []
        return rep

    def counters_report(self, reset: bool = True) -> Dict[str, float]:
        """Scheduling-efficiency counters since the last reset, plus the
        two derived loss ratios the churn number hinges on:

        - prefill_pad_waste: fraction of prefill FLOPs spent on padding
          (duplicate rows filling a group to its compiled batch + prompt
          rows padded to the bucket/chunk length);
        - chunk_util: kept tokens / dispatched chunk slot-capacity (empty
          slots + over-generation discards are the gap; chunk wall-clock
          is ~independent of live-slot count, so 1-util is pure loss)."""
        rep: Dict[str, float] = dict(self.counters)
        if rep.get("prefill_tokens"):
            rep["prefill_pad_waste"] = round(
                1.0 - rep.get("prefill_real_tokens", 0)
                / rep["prefill_tokens"], 4)
        if rep.get("chunk_capacity_tokens"):
            rep["chunk_util"] = round(
                rep.get("chunk_kept_tokens", 0)
                / rep["chunk_capacity_tokens"], 4)
            rep["chunk_live_util"] = round(
                rep.get("chunk_kept_tokens", 0)
                / max(rep.get("chunk_live_tokens", 1), 1), 4)
        if reset:
            self.counters = {}
        return rep

    # -- fused-loop serving internals ----------------------------------------

    # scheduling overhead of one loop-chunk boundary, in decode-step units
    # (host round-trip + admission bookkeeping vs ~10ms/step at b=256);
    # biases the chunk choice toward longer chunks. Static prior only —
    # once a few chunks have run, the measured EWMA ratio replaces it
    # (boundary cost is dominated by admission prefill DEVICE time, which
    # varies with traffic; step cost is ~1.7ms + 36us/slot on v5e, so the
    # right bias at b=64 is ~11 steps, not 4)
    _SCHED_OVERHEAD_STEPS = 4

    def _update_sched_ewma(self, boundary_s: float, step_s: float) -> None:
        a = 0.3
        prev_b = getattr(self, "_ewma_boundary_s", None)
        prev_s = getattr(self, "_ewma_step_s", None)
        self._ewma_boundary_s = (boundary_s if prev_b is None
                                 else (1 - a) * prev_b + a * boundary_s)
        self._ewma_step_s = (step_s if prev_s is None
                             else (1 - a) * prev_s + a * step_s)

    @property
    def _sched_overhead_steps(self) -> int:
        b = getattr(self, "_ewma_boundary_s", None)
        s = getattr(self, "_ewma_step_s", None)
        if b and s:
            # clamp: early iterations include jit compiles on both sides
            return max(1, min(24, round(b / s)))
        return self._SCHED_OVERHEAD_STEPS

    def _chunk_steps(self, loop_steps: int) -> int:
        """Adaptive chunk length: maximize useful tokens per wall-clock.

        A slot that exhausts its budget (or hits EOS) mid-chunk idles until
        the chunk ends and its overrun tokens are discarded, but shorter
        chunks pay a scheduling boundary more often. Chunk time is
        ~c * t_step regardless of how many slots stay live, so pick the
        power-of-two c <= loop_steps maximizing
        sum_i min(rem_i, c) / (c + overhead). Homogeneous steady-state
        batches still choose full chunks; churny mixed-budget pools drop
        to the knee of the budget distribution instead of burning whole
        chunks on mostly-finished batches. Compiled-variant count stays
        log2(loop_steps/8)."""
        rem = [self._slot_budget[i] for i, r in enumerate(self.slots)
               if r is not None]
        if not rem:
            return loop_steps
        if not any(rem):
            # every live slot has an exhausted budget (all pending
            # first-token finishes) — a chunk would be 100% discarded
            return 0
        best_c, best_rate = loop_steps, -1.0
        cands = []
        c = 8
        while c <= loop_steps:
            cands.append(c)
            c *= 2
        if loop_steps >= 8 and loop_steps not in cands:
            # non-power-of-two ceilings (run_until_done(loop_steps=48))
            # must still be dispatchable at full length for homogeneous
            # steady-state batches
            cands.append(loop_steps)
        overhead = self._sched_overhead_steps
        for c in cands:
            rate = (sum(min(r, c) for r in rem)
                    / (c + overhead))
            if rate > best_rate:
                best_rate, best_c = rate, c
        return best_c

    def _fused_chunk_len(self, loop_steps: int) -> int:
        """The budget-adaptive chunk, shrunk (if needed) to the max_len
        headroom of the fullest active slot; 0 when no fused chunk fits.
        Planning runs entirely on host-tracked lengths — no device sync,
        so the chunk dispatch overlaps the in-flight admission prefills."""
        chunk = self._chunk_steps(loop_steps)
        if not chunk:
            return 0
        amax = max((int(self._lengths_host[i])
                    for i, r in enumerate(self.slots)
                    if r is not None), default=0)
        headroom = self.max_len - amax
        while chunk:
            if -(-chunk // 8) * 8 <= headroom:  # tail ring rounds up to 8s
                return chunk
            if chunk <= 8:
                return 0
            chunk //= 2
        return 0

    # piggybacked-prefill shape constants: prompts up to _PIGGY_CAP tokens
    # ride the decode chunk in cap/num_steps-token slices, at most _PIGGY_G
    # prompts per chunk (one compiled payload shape per loop variant).
    # Class-level defaults only; __init__ re-reads FASN_PIGGY_CAP/FASN_PIGGY_G
    # per engine (scheduler experiments — scripts/bench_churn.py).
    _PIGGY_CAP = 128
    _PIGGY_G = 8

    def _take_piggyback(self, chunk: int) -> Optional[Dict]:
        """Reserve up to _PIGGY_G queued prompts to prefill INSIDE the next
        decode chunk (engine_decode_loop p_tokens payload).

        Eligibility: no mesh, a valid chunk split, an all-greedy slot pool
        (the mixed step's sampling is argmax-only), prompt <= _PIGGY_CAP,
        greedy request. Only a FIFO prefix of the queue is taken so
        ordering guarantees stay exactly those of classic admission; the
        first ineligible request stops the scan (it and everything behind
        it go through the classic lanes this round)."""
        if (not self.piggyback_prefill or self.mesh is not None
                or not chunk or chunk > self._PIGGY_CAP
                or self._PIGGY_CAP % chunk or self._PIGGY_CAP > self.max_len
                or not self.queue):
            return None
        if self._sampling_arrays(self.slots) is not None:
            return None
        free = [i for i in range(self.max_batch)
                if self.slots[i] is None and i not in self._pending_prefill]
        take: List[Request] = []
        for req in self.queue:
            if len(take) >= min(self._PIGGY_G, len(free)):
                break
            if (req.temperature != 0.0 or not req.prompt
                    or len(req.prompt) > self._PIGGY_CAP):
                break
            take.append(req)
        if not take:
            return None
        ids = {id(r) for r in take}
        self.queue = deque(r for r in self.queue if id(r) not in ids)
        slots = free[:len(take)]
        for i, req in zip(slots, take):
            self._pending_prefill[i] = req
        g = self._PIGGY_G
        pads = g - len(take)
        import numpy as _np
        toks = _np.zeros((g, self._PIGGY_CAP), _np.int32)
        lens = _np.zeros((g,), _np.int32)
        for gi, req in enumerate(take + [take[-1]] * pads):
            toks[gi, :len(req.prompt)] = req.prompt
            lens[gi] = len(req.prompt)
        c = self.counters
        c["piggyback_prompts"] = (c.get("piggyback_prompts", 0) + len(take))
        c["piggyback_tokens"] = (c.get("piggyback_tokens", 0)
                                 + sum(len(r.prompt) for r in take))
        return {"reqs": take, "slots": slots,
                "p_tokens": jnp.asarray(toks),
                "p_slots": jnp.asarray(slots + [slots[-1]] * pads,
                                       jnp.int32),
                "p_true_lens": jnp.asarray(lens, jnp.int32)}

    def _undo_piggyback(self, piggy: Dict) -> None:
        for req in reversed(piggy["reqs"]):
            self.queue.appendleft(req)
        for i in piggy["slots"]:
            self._pending_prefill.pop(i, None)
        c = self.counters
        c["piggyback_prompts"] = (c.get("piggyback_prompts", 0)
                                  - len(piggy["reqs"]))
        c["piggyback_tokens"] = (c.get("piggyback_tokens", 0)
                                 - sum(len(r.prompt)
                                       for r in piggy["reqs"]))

    def _get_loop(self, loop_steps: int, attn_len: int):
        from flash_attention_softmax_n_tpu.engine.engine import (
            engine_decode_loop,
        )

        if not hasattr(self, "_loops"):
            self._loops = {}
        key = (loop_steps, attn_len)
        if key not in self._loops:
            self._loops[key] = jax.jit(
                partial(engine_decode_loop, cfg=self.cfg,
                        num_steps=loop_steps, mesh=self.mesh,
                        attn_len=attn_len),
                donate_argnames=("cache",))
        return self._loops[key]

    def prewarm(self, loop_steps: int = 64,
                attn_lens: Optional[List[int]] = None) -> int:
        """AOT-compile every greedy fused-loop jit variant this engine can
        dispatch — (chunk length x attn_len bucket x piggyback payload) —
        so serving never compiles mid-traffic (measured: a cold variant
        hit mid-wave costs a multi-second stall; `jit.lower().compile()`
        with abstract avals populates the same cache the live call uses,
        so nothing executes and the donated cache is untouched).

        ``attn_lens``: restrict to these attention-window buckets (each a
        multiple of 256, capped at max_len) when the caller knows its
        workload's length ceiling — every bucket costs one full AOT
        compile per chunk variant. Default: all buckets up to max_len.

        Greedy variants only: per-slot sampling adds (B,) data arrays (a
        different arg structure) and temperature traffic usually warms
        them naturally. Returns the number of variants compiled. No-op
        variants already compiled are skipped by jax's cache (cheap).

        Sharded engines (``mesh``) prewarm too (round-4, VERDICT r3 item
        8): params/cache avals carry their live NamedShardings so the AOT
        executable is the one the live dispatch looks up — a mesh engine
        otherwise keeps the mid-traffic compile-stall failure mode the
        single-chip path fixed. Piggyback variants are single-host only
        (piggybacked prefill is disabled under mesh, _take_piggyback).
        """
        sds = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=getattr(a, "sharding", None)), t)
        aparams, acache = sds(self.params), sds(self.cache)
        atoks = jax.ShapeDtypeStruct((self.max_batch,), jnp.int32)
        aact = jax.ShapeDtypeStruct((self.max_batch,), jnp.bool_)
        apig = {
            "p_tokens": jax.ShapeDtypeStruct(
                (self._PIGGY_G, self._PIGGY_CAP), jnp.int32),
            "p_slots": jax.ShapeDtypeStruct((self._PIGGY_G,), jnp.int32),
            "p_true_lens": jax.ShapeDtypeStruct((self._PIGGY_G,),
                                                jnp.int32),
        }
        # candidate chunks = _chunk_steps' candidates (powers of two plus
        # the loop_steps ceiling itself), CLOSED under _fused_chunk_len's
        # headroom halving (chunk //= 2 while chunk > 8) — a non-power-of-
        # two ceiling like 48 can dispatch 24/12/6, which must not be cold
        cands = {loop_steps} if loop_steps >= 8 else set()
        c = 8
        while c <= loop_steps:
            cands.add(c)
            c *= 2
        chunk_set, stack = set(), list(cands)
        while stack:
            c = stack.pop()
            if c in chunk_set:
                continue
            chunk_set.add(c)
            if c > 8:
                stack.append(c // 2)
        chunks = sorted(chunk_set)
        if attn_lens is not None:
            lens = sorted({min(self.max_len, -(-int(al) // 256) * 256)
                           for al in attn_lens})
        else:
            lens = sorted({min(self.max_len, 256 * i)
                           for i in range(1, -(-self.max_len // 256) + 1)})
        n = 0
        for chunk in chunks:
            for al in lens:
                loop = self._get_loop(chunk, al)
                loop.lower(params=aparams, tokens=atoks, cache=acache,
                           active=aact).compile()
                n += 1
                if (self.piggyback_prefill and self.mesh is None
                        and chunk <= self._PIGGY_CAP
                        and self._PIGGY_CAP % chunk == 0):
                    loop.lower(params=aparams, tokens=atoks, cache=acache,
                               active=aact, **apig).compile()
                    n += 1
        return n

    def _dispatch_chunk(self, loop_steps: int, piggy: Optional[Dict] = None):
        """Launch one fused decode chunk; returns the bookkeeping handle
        (device tokens + the slots that were active at entry). No sync."""
        # attention cache window: the loop only attends main-cache rows up
        # to the loop-entry lengths of ACTIVE slots; bucket to 256s so each
        # loop_steps compiles at most max_len/256 variants
        entry_active = [i for i, r in enumerate(self.slots) if r is not None]
        amax = max((int(self._lengths_host[i]) for i in entry_active),
                   default=0)
        attn_len = min(self.max_len, -(-max(amax, 1) // 256) * 256)
        key = (loop_steps, attn_len)
        self._get_loop(loop_steps, attn_len)
        active = jnp.asarray([r is not None for r in self.slots], bool)
        # per-slot sampling settings are DATA (B,) arrays, so mixed batches
        # share the executable; all-greedy passes None to keep the fused
        # argmax lm_head (a distinct pytree structure -> jit specializes)
        sample_kw = self._sampling_arrays(self.slots) or {}
        if sample_kw:
            self._rng, sample_kw["rng"] = jax.random.split(self._rng)
        first_toks = None
        if piggy is not None:
            toks, self.cache, _, first_toks = self._loops[key](
                params=self.params, tokens=self._next_token,
                cache=self.cache, active=active,
                p_tokens=piggy["p_tokens"], p_slots=piggy["p_slots"],
                p_true_lens=piggy["p_true_lens"], **sample_kw)
        else:
            toks, self.cache, _ = self._loops[key](
                params=self.params, tokens=self._next_token,
                cache=self.cache, active=active, **sample_kw)
        # slots active at entry advance exactly loop_steps on device (the
        # loop never deactivates slots itself — EOS handling is host-side)
        for i in entry_active:
            self._lengths_host[i] += loop_steps
        c = self.counters
        c["chunks"] = c.get("chunks", 0) + 1
        c["chunk_capacity_tokens"] = (c.get("chunk_capacity_tokens", 0)
                                      + loop_steps * self.max_batch)
        c["chunk_live_tokens"] = (c.get("chunk_live_tokens", 0)
                                  + loop_steps * len(entry_active))
        return toks, entry_active, piggy, first_toks

    def _finalize_chunk(self, handle) -> List[Request]:
        """Sync on a dispatched chunk's tokens and do the bookkeeping.
        Slots freed since dispatch (e.g. a first-token EOS found by
        _finalize_admission) are skipped — their chunk tokens are
        discarded, the standard over-generation rule."""
        toks, entry_active, piggy, first_toks = handle
        if piggy is not None:
            toks_host, first_host = jax.device_get((toks, first_toks))
        else:
            toks_host = jax.device_get(toks)

        finished = []
        if piggy is not None:
            # piggybacked prompts finished their prefill inside the chunk;
            # the same first-token bookkeeping as _finalize_admission
            for g, (i, req) in enumerate(zip(piggy["slots"],
                                             piggy["reqs"])):
                tok = int(first_host[g])
                req.output.append(tok)
                del self._pending_prefill[i]
                if (req.max_new_tokens <= 1
                        or (req.eos_token is not None
                            and tok == req.eos_token)):
                    req.done = True
                    finished.append(req)
                else:
                    self.slots[i] = req
                    self._slot_budget[i] = req.max_new_tokens - 1
                    self._lengths_host[i] = len(req.prompt)
                    self._next_host[i] = tok
        upd_idx, upd_val = [], []
        for i in entry_active:
            req = self.slots[i]
            if req is None:
                continue
            emitted = [int(t) for t in toks_host[i]]
            take = min(self._slot_budget[i], len(emitted))
            if req.eos_token is not None and req.eos_token in emitted[:take]:
                take = emitted.index(req.eos_token) + 1
            req.output.extend(emitted[:take])
            self.counters["chunk_kept_tokens"] = (
                self.counters.get("chunk_kept_tokens", 0) + take)
            self._slot_budget[i] -= take
            # a slot truncated mid-chunk (budget/EOS) is always freed below,
            # and re-admission prefills it from scratch — no cache rewind
            # needed for the over-advanced lengths
            if (self._slot_budget[i] <= 0
                    or (req.eos_token is not None
                        and req.output[-1] == req.eos_token)):
                req.done = True
                finished.append(req)
                self.slots[i] = None
                self._slot_budget[i] = 0
            else:
                upd_idx.append(i)
                upd_val.append(req.output[-1])
        for i, v in zip(upd_idx, upd_val):
            self._next_host[i] = v
        # ONE fixed-shape host->device upload per scheduling point (per-slot
        # .at[i].set dispatches cost ~ms each on a relay-attached device;
        # variable-length scatters recompile per update count)
        self._next_token = jnp.asarray(self._next_host)
        return finished

    # -- internals ----------------------------------------------------------

    def _admit(self) -> List[Request]:
        """Synchronous admission: dispatch + finalize in one call (the
        per-step path); the fused-loop scheduler instead interleaves
        _admit_async / _dispatch_chunk / _finalize_admission so the decode
        chunk is dispatched before the host ever waits on a prefill."""
        return self._finalize_admission(self._admit_async())

    def _admit_async(self) -> List[Tuple[List[Tuple[int, Request]],
                                         jax.Array]]:
        """Admit queued requests into free slots, prefilling same-bucket
        groups in one batched forward (admission is weight-bound; batching
        amortizes the weight stream across requests). Groups are always
        padded to the full group size — min(8, max_batch) — by repeating
        the last request; duplicate slot writes are idempotent, so each
        prompt bucket compiles exactly ONE prefill shape.

        DISPATCH-ONLY: no host sync. Slots/budgets/host-lengths are
        assigned eagerly and each group's first tokens are scattered into
        ``_next_token`` on device, so a decode chunk can launch immediately
        after — admission bookkeeping (EOS / 1-token finishes) happens in
        _finalize_admission once the results are needed. A request that
        finishes on its first token still rides the next chunk as an
        active slot; its chunk tokens are discarded at bookkeeping (the
        same over-generation-discard rule the chunk already uses).
        """
        free = [i for i in range(self.max_batch)
                if self.slots[i] is None and i not in self._pending_prefill]
        if not (free and self.queue):
            return []
        # ONE pass partitions the queue by prompt bucket (cross-bucket
        # reordering within an admission round is standard continuous
        # batching); FIFO preserved within a bucket and across rounds.
        # Prompts longer than the chunk size go to the CHUNKED prefill
        # lane instead of a monolithic max_len-bucket forward.
        by_bucket: Dict[int, deque] = {}
        order: List[int] = []
        long_reqs: List[Request] = []
        by_prefix: Dict[Tuple[int, int, int], deque] = {}
        cc = self._CHUNK
        for req in self.queue:
            if self._prefixes:
                m = self._match_prefix(req.prompt)
                if (m is not None
                        and -(-len(req.prompt) // cc) * cc <= self.max_len):
                    p, reuse = m
                    nch = -(-len(req.prompt) // cc)
                    by_prefix.setdefault((p["id"], reuse, nch),
                                         deque()).append(req)
                    continue
            if (len(req.prompt) > cc
                    and -(-len(req.prompt) // cc) * cc <= self.max_len):
                # chunk-padded length must fit the cache extent; prompts
                # within one chunk of max_len keep the bucket lane (whose
                # bucket clamp handles them)
                long_reqs.append(req)
                continue
            # clamp the pad bucket so a near-max_len prompt can't round up
            # past the cache extent (max_len=100, prompt=90 -> bucket 128
            # would fail the cache dynamic_update_slice at trace time)
            bkt = min(_bucket(len(req.prompt)), self.max_len)
            if bkt not in by_bucket:
                by_bucket[bkt] = deque()
                order.append(bkt)
            by_bucket[bkt].append(req)
        admitted: set = set()
        nb = min(self._ADMIT_G, self.max_batch)
        if self.mesh is not None:
            # the meshed prefill shard_maps over 'data': the group batch
            # must divide the axis (max_batch % dp == 0 is the engine
            # contract, so rounding up stays <= max_batch)
            dp = self.mesh.shape.get("data", 1)
            nb = min(self.max_batch, -(-nb // dp) * dp)
        pending: List[Tuple[List[Tuple[int, Request]], jax.Array]] = []

        def admit_group(group, nb, prefill_fn, padded_len):
            """Shared tail of both lanes: pad the group to the smallest
            compiled width that holds it (duplicate slot writes are
            idempotent). Width is the smallest power of two >= len(group)
            in [2, nb] — churn admissions are mostly partial groups, and
            always padding to 8 made duplicate rows ~1/3 of measured
            prefill pad waste; {2,4,8} costs at most 3 shapes per bucket,
            dispatch the lane's prefill(s), sample ALL padded rows (fixed
            (nb,) shape) and push the first tokens straight into the
            decode input on device. Padding rows may SAMPLE a different
            token than their original row (independent per-row draws) and
            duplicate-index scatter order is undefined, so they scatter to
            an out-of-range index and drop; only row j feeds slot
            group[j], exactly the rows bookkeeping reads."""
            nb_g = 2
            while nb_g < len(group):
                nb_g *= 2
            if self.mesh is not None:
                # meshed prefill shard_maps over 'data': width must divide
                # the axis (rounding up stays <= nb, which already does)
                dp = self.mesh.shape.get("data", 1)
                nb_g = -(-nb_g // dp) * dp
            nb = min(nb, nb_g)
            c = self.counters
            c["prefill_groups"] = c.get("prefill_groups", 0) + 1
            c["prefill_rows"] = c.get("prefill_rows", 0) + nb
            c["prefill_real_rows"] = (c.get("prefill_real_rows", 0)
                                      + len(group))
            c["prefill_tokens"] = (c.get("prefill_tokens", 0)
                                   + nb * padded_len)
            c["prefill_real_tokens"] = (c.get("prefill_real_tokens", 0)
                                        + sum(len(r.prompt)
                                              for _, r in group))
            padded_group = group + [group[-1]] * (nb - len(group))
            true_lens = jnp.asarray([len(r.prompt) for _, r in padded_group],
                                    jnp.int32)
            slots = jnp.asarray([i for i, _ in padded_group], jnp.int32)
            logits = prefill_fn(padded_group, true_lens, slots)
            toks = self._sample(logits, [r for _, r in padded_group])
            scatter_slots = jnp.asarray(
                [i for i, _ in group] + [self.max_batch] * (nb - len(group)),
                jnp.int32)
            self._next_token = self._next_token.at[scatter_slots].set(
                toks, mode="drop")
            for i, req in group:
                self.slots[i] = req
                self._lengths_host[i] = len(req.prompt)
                self._slot_budget[i] = req.max_new_tokens - 1
            pending.append((group, toks))

        def take_group(dq):
            group: List[Tuple[int, Request]] = []
            while free and dq and len(group) < nb:
                req = dq.popleft()
                admitted.add(id(req))
                group.append((free.pop(0), req))
            return group

        def run_bucket_lane():
            while free and any(by_bucket.values()):
                bucket = next(b for b in order if by_bucket[b])
                group = take_group(by_bucket[bucket])

                def prefill(padded_group, true_lens, slots, bucket=bucket):
                    tokens = jnp.asarray(
                        [r.prompt + [self.pad_token] * (bucket
                                                        - len(r.prompt))
                         for _, r in padded_group], jnp.int32)
                    logits, self.cache = self._prefill(
                        params=self.params, tokens=tokens,
                        true_lens=true_lens, slots=slots, cache=self.cache)
                    return logits

                admit_group(group, nb, prefill, padded_len=bucket)

        def run_chunked_lane():
            # chunked lane: long prompts stream through ceil(len/C)
            # bounded continuation prefills (engine_prefill_chunk), all
            # dispatched async — each chunk chains on the donated cache.
            # Requests with the SAME chunk count group together (each
            # chunk's weight stream amortizes across the group).
            by_chunks: Dict[int, deque] = {}
            for req in long_reqs:
                by_chunks.setdefault(-(-len(req.prompt) // cc),
                                     deque()).append(req)
            for n_chunks in sorted(by_chunks):
                dq = by_chunks[n_chunks]
                while free and dq:
                    group = take_group(dq)

                    def prefill(padded_group, true_lens, slots,
                                n_chunks=n_chunks):
                        padded = [r.prompt
                                  + [self.pad_token] * (n_chunks * cc
                                                        - len(r.prompt))
                                  for _, r in padded_group]
                        logits = None
                        for ci in range(n_chunks):
                            toks_c = jnp.asarray(
                                [p[ci * cc:(ci + 1) * cc] for p in padded],
                                jnp.int32)
                            logits, self.cache = self._prefill_chunk(
                                ci * cc)(
                                params=self.params, tokens=toks_c,
                                true_lens=true_lens, slots=slots,
                                cache=self.cache)
                        return logits

                    admit_group(group, nb, prefill,
                                padded_len=n_chunks * cc)

        def run_prefix_lane():
            # prefix-cache hits: scatter the store's rows into the group's
            # slots (one jitted copy, broadcast over the group), then run
            # only the SUFFIX chunks through the ordinary continuation
            # prefill (same compiled variants as the chunked lane)
            for pkey in sorted(by_prefix):
                pid, reuse, n_chunks = pkey
                store = next(p["store"] for p in self._prefixes
                             if p["id"] == pid)
                dq = by_prefix[pkey]
                while free and dq:
                    group = take_group(dq)

                    def prefill(padded_group, true_lens, slots,
                                n_chunks=n_chunks, reuse=reuse, store=store):
                        self.cache = self._prefix_insert(
                            reuse, len(padded_group))(
                            cache=self.cache, store=store, slots=slots)
                        padded = [r.prompt
                                  + [self.pad_token] * (n_chunks * cc
                                                        - len(r.prompt))
                                  for _, r in padded_group]
                        logits = None
                        for ci in range(reuse // cc, n_chunks):
                            toks_c = jnp.asarray(
                                [p[ci * cc:(ci + 1) * cc] for p in padded],
                                jnp.int32)
                            logits, self.cache = self._prefill_chunk(
                                ci * cc)(
                                params=self.params, tokens=toks_c,
                                true_lens=true_lens, slots=slots,
                                cache=self.cache)
                        c = self.counters
                        c["prefix_hits"] = (c.get("prefix_hits", 0)
                                            + len(group))
                        c["prefix_reused_tokens"] = (
                            c.get("prefix_reused_tokens", 0)
                            + reuse * len(group))
                        # admit_group counted the full prompts as real
                        # prefill work; the reused rows were never
                        # prefilled, so pad-waste accounting excludes them
                        c["prefill_real_tokens"] = (
                            c.get("prefill_real_tokens", 0)
                            - reuse * len(group))
                        return logits

                    admit_group(group, nb, prefill,
                                padded_len=n_chunks * cc - reuse)

        # anti-starvation: when the OLDEST queued request is a long
        # prompt (or a prefix hit), its lane runs first — otherwise
        # sustained short traffic would consume every free slot ahead of
        # it forever
        lanes = [run_bucket_lane, run_prefix_lane, run_chunked_lane]
        if self.queue:
            head = self.queue[0]
            if long_reqs and head is long_reqs[0]:
                lanes = [run_chunked_lane, run_prefix_lane, run_bucket_lane]
            elif any(head is r for dq in by_prefix.values() for r in dq):
                lanes = [run_prefix_lane, run_bucket_lane, run_chunked_lane]
        for lane in lanes:
            lane()
        if admitted:
            # one O(queue) rebuild preserves global FIFO for what's left
            self.queue = deque(r for r in self.queue
                               if id(r) not in admitted)
        return pending

    # -- prefix caching -------------------------------------------------

    def register_prefix(self, tokens: List[int]) -> int:
        """Prefill a shared prompt prefix ONCE into a detached KV store.

        Serving workloads share system-prompt prefixes; admission is the
        larger half of churn time (CLAUDE.md decode-step model), so a
        prompt that starts with a registered prefix reuses the stored KV
        rows (a device copy, ~1 MB/request) and prefills only its suffix
        through the existing chunked-continuation lane — the compiled
        shapes are EXACTLY the long-prompt continuation variants, so the
        hit path adds no new jit variants beyond the per-(rows, width)
        insert scatter.

        Only whole prefill-chunks are stored (floor(len/chunk) * chunk
        rows): the suffix prefill then starts at a chunk boundary. The
        store is quantized exactly like the main cache, so a hit is
        bit-identical to having prefilled those rows in place. Returns a
        prefix id; prompts match the LONGEST registered prefix.

        Sharded engines (``mesh``) register too (round 5, VERDICT r4 item
        5): the scratch prefill runs with one identical slot per 'data'
        shard (the meshed prefill shard_maps over 'data', so its batch
        must divide the axis), shard 0's rows become the store, and the
        store is placed replicated over 'data' with KV heads sharded over
        'model' — the same head sharding as the main cache, so the hit
        path's insert scatter partitions without cross-shard traffic.
        """
        cc = self._CHUNK
        rows = (len(tokens) // cc) * cc
        if rows < cc:
            raise ValueError(
                f"prefix must be >= prefill_chunk={cc} tokens to be worth "
                f"caching (got {len(tokens)})")
        if rows > self.max_len:
            raise ValueError("prefix longer than engine max_len")
        cfg = self.cfg
        width = (self.mesh.shape.get("data", 1)
                 if self.mesh is not None else 1)
        if self._kv_quantization is not None:
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                init_quantized_kv_cache,
            )
            scratch = init_quantized_kv_cache(
                cfg.n_layers, width, cfg.n_kv_heads, rows, cfg.head_dim,
                mode=self._kv_quantization)
        else:
            shape = (cfg.n_layers, width, cfg.n_kv_heads, rows,
                     cfg.head_dim)
            scratch = {"k": jnp.zeros(shape, cfg.dtype),
                       "v": jnp.zeros(shape, cfg.dtype)}
        scratch["lengths"] = jnp.zeros((width,), jnp.int32)
        scratch.pop("length", None)
        if self.mesh is not None:
            from flash_attention_softmax_n_tpu.parallel.sharding import (
                kv_cache_specs,
                shard_pytree,
            )
            scratch = shard_pytree(scratch, kv_cache_specs(scratch),
                                   self.mesh)
        tl = jnp.full((width,), rows, jnp.int32)
        sl = jnp.arange(width, dtype=jnp.int32)
        for ci in range(rows // cc):
            toks = jnp.asarray([tokens[ci * cc:(ci + 1) * cc]] * width,
                               jnp.int32)
            _, scratch = self._prefill_chunk(ci * cc)(
                params=self.params, tokens=toks, true_lens=tl, slots=sl,
                cache=scratch)
        if isinstance(scratch["k"], QTensor):
            store = {
                "k": QTensor(scratch["k"].values[:, 0],
                             scratch["k"].scales[:, 0],
                             bits=scratch["k"].bits),
                "v": QTensor(scratch["v"].values[:, 0],
                             scratch["v"].scales[:, 0],
                             bits=scratch["v"].bits),
            }
        else:
            store = {"k": scratch["k"][:, 0], "v": scratch["v"][:, 0]}
        if self.mesh is not None:
            # place the store like the cache sans the slot dim: KV heads
            # sharded over 'model', rows replicated over 'data' — every
            # data shard inserts its local slots from a local copy
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            sh = NamedSharding(self.mesh, P(None, "model"))
            store = jax.tree.map(lambda x: jax.device_put(x, sh), store)
        pid = len(self._prefixes)
        self._prefixes.append({"id": pid, "tokens": tuple(tokens[:rows]),
                               "rows": rows, "store": store})
        self._prefixes.sort(key=lambda p: -p["rows"])  # longest-match first
        return pid

    def _match_prefix(self, prompt: List[int]):
        """(prefix_entry, reuse_rows) for the longest registered prefix of
        ``prompt``, or None. reuse is clamped to whole chunks strictly
        inside the prompt (>= 1 suffix token must remain to produce the
        first sampled logits)."""
        cc = self._CHUNK
        cap = ((len(prompt) - 1) // cc) * cc
        for p in self._prefixes:
            reuse = min(p["rows"], cap)
            if reuse >= cc and tuple(prompt[:reuse]) == p["tokens"][:reuse]:
                return p, reuse
        return None

    def _prefix_insert(self, rows: int, width: int):
        """jitted (cache, store, slots) -> cache: scatter the store's
        first ``rows`` KV rows into ``width`` slots (donated cache)."""
        key = (rows, width)
        if key not in self._prefix_inserts:
            def insert(cache, store, slots):
                cache = dict(cache)

                def wr(ckv, skv):
                    if isinstance(ckv, QTensor):
                        return QTensor(
                            ckv.values.at[:, slots, :, :rows].set(
                                skv.values[:, None, :, :rows].astype(
                                    ckv.values.dtype)),
                            ckv.scales.at[:, slots, :, :rows].set(
                                skv.scales[:, None, :, :rows]),
                            bits=ckv.bits)
                    return ckv.at[:, slots, :, :rows].set(
                        skv[:, None, :, :rows].astype(ckv.dtype))

                cache["k"] = wr(cache["k"], store["k"])
                cache["v"] = wr(cache["v"], store["v"])
                return cache

            self._prefix_inserts[key] = jax.jit(
                insert, donate_argnames=("cache",))
        return self._prefix_inserts[key]

    def _prefill_chunk(self, offset: int):
        if not hasattr(self, "_prefill_chunks"):
            self._prefill_chunks = {}
        if offset not in self._prefill_chunks:
            self._prefill_chunks[offset] = jax.jit(
                partial(engine_prefill_chunk, cfg=self.cfg, offset=offset,
                        mesh=self.mesh),
                donate_argnames=("cache",))
        return self._prefill_chunks[offset]

    def _finalize_admission(
            self, pending: List[Tuple[List[Tuple[int, Request]],
                                      jax.Array]]) -> List[Request]:
        """One sync for the whole admission round, then bookkeeping:
        first-token append, EOS / 1-token finishes, next-token mirror."""
        finished: List[Request] = []
        if not pending:
            return finished
        all_toks = jax.device_get([t for _, t in pending])
        for (group, _), toks_host in zip(pending, all_toks):
            for (i, req), tok in zip(group, toks_host):
                tok = int(tok)
                req.output.append(tok)
                if (req.max_new_tokens <= 1
                        or (req.eos_token is not None
                            and tok == req.eos_token)):
                    req.done = True
                    finished.append(req)
                    self.slots[i] = None
                    self._slot_budget[i] = 0
                else:
                    self._next_host[i] = tok
        return finished

    @staticmethod
    def _sampling_arrays(rows: List[Optional[Request]]) -> Optional[Dict]:
        """Per-row sampling settings as (B,) arrays, or None if every row
        is greedy. top_k/top_p only appear when some sampling row actually
        truncates — the sort-bearing filtered path costs a vocab sort, so
        it should only compile when needed (ops/sampling.py rationale)."""
        temps = [r.temperature if r is not None else 0.0 for r in rows]
        if not any(t > 0 for t in temps):
            return None
        kw = {"temps": jnp.asarray(temps, jnp.float32)}
        if any(r is not None and r.temperature > 0
               and (r.top_k > 0 or r.top_p < 1.0) for r in rows):
            kw["top_k"] = jnp.asarray([r.top_k if r is not None else 0
                                       for r in rows], jnp.int32)
            kw["top_p"] = jnp.asarray([r.top_p if r is not None else 1.0
                                       for r in rows], jnp.float32)
        return kw

    def _sample(self, logits: jax.Array,
                reqs: List[Optional[Request]]) -> jax.Array:
        """Greedy at temperature 0, else per-row temperature/top-k/top-p.
        ``reqs`` holds one Request (or None = greedy) per logits row."""
        kw = self._sampling_arrays(reqs[:logits.shape[0]])
        if kw is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        self._rng, sub = jax.random.split(self._rng)
        return sample_tokens(logits, sub, kw["temps"], kw.get("top_k"),
                             kw.get("top_p"))
