"""Fused decode-attention kernel tests (dense + quantized caches).

Oracle: the XLA cached-attention path (itself validated against
slow_attention_n through the decoder test suite). Covers per-slot lengths,
GQA groups, softmax-N values, int8/fp8 dequant folding, and padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu.kernels.decode_attention import (
    decode_attention_n,
)
from flash_attention_softmax_n_tpu.ops.functional import softmax_n
from flash_attention_softmax_n_tpu.quant.kv_cache import quantize_kv

NEG_INF = -1e30


def oracle(q, k, v, lengths, n, k_scales=None, v_scales=None):
    """(B,H,hd) x (B,KVH,S,hd) reference in f32."""
    b, h, hd = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    kf = jnp.repeat(k.astype(jnp.float32), rep, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), rep, axis=1)
    if k_scales is not None:
        kf = kf * jnp.repeat(k_scales, rep, axis=1)
        vf = vf * jnp.repeat(v_scales, rep, axis=1)
    s = jnp.einsum("bhe,bhse->bhs", q.astype(jnp.float32), kf)
    s = s * (hd ** -0.5)
    valid = jnp.arange(k.shape[2])[None, None, :] < lengths[:, None, None]
    s = jnp.where(valid, s, NEG_INF)
    p = softmax_n(s, n=n, axis=-1)
    return jnp.einsum("bhs,bhsv->bhv", p, vf)


def make_cache(rng, b, kvh, s, hd, mode=None):
    k = 0.5 * jax.random.normal(jax.random.fold_in(rng, 0), (b, kvh, s, hd))
    v = 0.5 * jax.random.normal(jax.random.fold_in(rng, 1), (b, kvh, s, hd))
    if mode is None:
        return k, v, None, None
    bits = 8 if mode == "int8" else -8
    kq, ks = quantize_kv(k, bits)
    vq, vs = quantize_kv(v, bits)
    return kq, vq, ks, vs


class TestDecodeAttention:
    @pytest.mark.parametrize("n", [0.0, 1.0, 4.0])
    def test_dense_matches_oracle(self, n):
        rng = jax.random.PRNGKey(0)
        b, h, kvh, s, hd = 4, 8, 8, 256, 64
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        k, v, _, _ = make_cache(rng, b, kvh, s, hd)
        lengths = jnp.asarray([256, 100, 1, 77], jnp.int32)
        out = decode_attention_n(q, k, v, lengths, softmax_n_param=n)
        exp = oracle(q, k, v, lengths, n)
        np.testing.assert_allclose(out, exp, atol=2e-3)

    def test_gqa_groups(self):
        rng = jax.random.PRNGKey(1)
        b, h, kvh, s, hd = 2, 8, 2, 128, 32
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        k, v, _, _ = make_cache(rng, b, kvh, s, hd)
        lengths = jnp.asarray([128, 60], jnp.int32)
        out = decode_attention_n(q, k, v, lengths, softmax_n_param=1.0)
        exp = oracle(q, k, v, lengths, 1.0)
        np.testing.assert_allclose(out, exp, atol=2e-3)

    @pytest.mark.parametrize("mode,atol", [("int8", 2e-2), ("fp8", 8e-2)])
    def test_quantized_matches_oracle(self, mode, atol):
        rng = jax.random.PRNGKey(2)
        b, h, kvh, s, hd = 2, 4, 4, 256, 64
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        kq, vq, ks, vs = make_cache(rng, b, kvh, s, hd, mode)
        lengths = jnp.asarray([200, 31], jnp.int32)
        out = decode_attention_n(q, kq, vq, lengths, k_scales=ks, v_scales=vs,
                                 softmax_n_param=1.0)
        exp = oracle(q, kq, vq, lengths, 1.0, ks, vs)
        np.testing.assert_allclose(out, exp, atol=atol)

    def test_int8_close_to_unquantized(self):
        # end-to-end: quantized attention ~ dense attention
        rng = jax.random.PRNGKey(3)
        b, h, kvh, s, hd = 2, 4, 4, 128, 64
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        k, v, _, _ = make_cache(rng, b, kvh, s, hd)
        kq, ks = quantize_kv(k, 8)
        vq, vs = quantize_kv(v, 8)
        lengths = jnp.full((b,), s, jnp.int32)
        out_q = decode_attention_n(q, kq, vq, lengths, k_scales=ks,
                                   v_scales=vs, softmax_n_param=1.0)
        out_d = oracle(q, k, v, lengths, 1.0)
        np.testing.assert_allclose(out_q, out_d, atol=3e-2)

    def test_length_one(self):
        rng = jax.random.PRNGKey(4)
        b, h, kvh, s, hd = 1, 2, 2, 128, 32
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        k, v, _, _ = make_cache(rng, b, kvh, s, hd)
        lengths = jnp.asarray([1], jnp.int32)
        out = decode_attention_n(q, k, v, lengths, softmax_n_param=1.0)
        exp = oracle(q, k, v, lengths, 1.0)
        np.testing.assert_allclose(out, exp, atol=2e-3)

    def test_non_multiple_seq_len(self):
        # S not a multiple of the block: padded keys must not contribute
        rng = jax.random.PRNGKey(5)
        b, h, kvh, s, hd = 2, 2, 2, 200, 32
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        k, v, _, _ = make_cache(rng, b, kvh, s, hd)
        lengths = jnp.asarray([200, 150], jnp.int32)
        out = decode_attention_n(q, k, v, lengths, softmax_n_param=1.0,
                                 block_s=128)
        exp = oracle(q, k, v, lengths, 1.0)
        np.testing.assert_allclose(out, exp, atol=2e-3)

    def test_jit(self):
        rng = jax.random.PRNGKey(6)
        b, h, kvh, s, hd = 1, 2, 2, 128, 32
        q = 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (b, h, hd))
        k, v, _, _ = make_cache(rng, b, kvh, s, hd)
        lengths = jnp.asarray([99], jnp.int32)
        f = jax.jit(lambda q, k, v, le: decode_attention_n(
            q, k, v, le, softmax_n_param=1.0))
        np.testing.assert_allclose(f(q, k, v, lengths),
                                   oracle(q, k, v, lengths, 1.0), atol=2e-3)


class TestImplementationValidation:
    def test_unknown_implementation_rejected(self):
        from flash_attention_softmax_n_tpu.kernels.decode_attention import (
            decode_attention_n,
        )
        q = jnp.zeros((1, 4, 64))
        k = jnp.zeros((1, 2, 8, 64))
        lens = jnp.ones((1,), jnp.int32)
        # 'auto' is NOT a decode route (cfg.decode_attn_impl is xla|pallas);
        # a typo must fail loudly instead of silently picking the kernel
        with pytest.raises(ValueError, match="unknown decode attention"):
            decode_attention_n(q, k, k, lens, implementation="auto")
