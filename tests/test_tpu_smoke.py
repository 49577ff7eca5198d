"""Real-TPU smoke tests (skipped on CPU).

The main suite runs Pallas kernels in interpreter mode, which does NOT
exercise Mosaic lowering — several bugs this project hit (8-bit shifts in
the int4 unpack, small-vector shape casts in the cache writer, scoped-VMEM
overflows) only reproduce on hardware. Run on a TPU host:

    FASN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

Each test compiles + executes the kernel against its oracle at a shape
known to have broken a previous revision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU (Mosaic)")


@requires_tpu
class TestMosaicLowering:
    def test_int4_matmul_compiles_and_matches(self):
        # regression: 'arith.shli' / 8-bit compares fail to legalize
        from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
            quantized_matmul,
        )
        from flash_attention_softmax_n_tpu.quant.qtensor import (
            dequantize,
            quantize,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 2048), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (2048, 5632),
                              jnp.bfloat16)
        qt = quantize(w, bits=4, axis=0)
        ref = x.astype(jnp.float32) @ dequantize(qt).astype(jnp.float32)
        out = jax.jit(lambda x: quantized_matmul(
            x, qt.values, qt.scales, bits=4))(x)
        rel = (float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
               / float(jnp.max(jnp.abs(ref))))
        assert rel < 0.01

    def test_w8a8_matmul(self):
        from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
            quantized_matmul,
        )
        from flash_attention_softmax_n_tpu.quant.qtensor import quantize
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 2048), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (2048, 32000),
                              jnp.bfloat16)  # lm_head shape: VMEM edge
        qt = quantize(w, bits=8, axis=0)
        ref = (x.astype(jnp.float32)
               @ (qt.values.astype(jnp.float32) * qt.scales))
        out = jax.jit(lambda x: quantized_matmul(
            x, qt.values, qt.scales, bits=8, act_quant=True))(x)
        rel = (float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
               / float(jnp.max(jnp.abs(ref))))
        assert rel < 0.02

    def test_fused_argmax_lm_head(self):
        # greedy sampling in the lm_head epilogue at the real vocab shape;
        # scratch-merged cross-tile argmax must match XLA bit-exactly
        from flash_attention_softmax_n_tpu.kernels.quant_matmul import (
            quantized_matmul,
            quantized_matmul_argmax,
        )
        from flash_attention_softmax_n_tpu.quant.qtensor import quantize
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 2048), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (2048, 32000),
                              jnp.bfloat16)
        qt = quantize(w, bits=8, axis=0)
        ref = jnp.argmax(jax.jit(lambda x: quantized_matmul(
            x, qt.values, qt.scales, bits=8, out_dtype=jnp.float32))(x),
            axis=-1)
        out = jax.jit(lambda x: quantized_matmul_argmax(
            x, qt.values, qt.scales))(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_fused_mlp(self):
        # whole SwiGLU block in one kernel: three MXU dots + silu per grid
        # step, f32 accumulator in VMEM scratch at the TinyLlama-1.1B shape
        from flash_attention_softmax_n_tpu.kernels.fused_mlp import (
            fused_mlp_matmul,
        )
        from flash_attention_softmax_n_tpu.quant.qtensor import quantize
        k, f = 2048, 5632
        x = jax.random.normal(jax.random.PRNGKey(0), (64, k), jnp.bfloat16)
        key = jax.random.PRNGKey(1)
        wg = jax.random.normal(key, (k, f), jnp.float32) / 32
        wu = jax.random.normal(jax.random.PRNGKey(2), (k, f), jnp.float32) / 32
        wd = jax.random.normal(jax.random.PRNGKey(3), (f, k), jnp.float32) / 64
        qg, qu, qd = (quantize(w, bits=8, axis=0) for w in (wg, wu, wd))
        xf = x.astype(jnp.float32)
        ref = (jax.nn.silu(xf @ wg) * (xf @ wu)) @ wd
        out = jax.jit(lambda x: fused_mlp_matmul(
            x, qg.values, qg.scales, qu.values, qu.scales,
            qd.values, qd.scales, out_dtype=jnp.float32))(x)
        rel = (float(jnp.max(jnp.abs(out - ref)))
               / float(jnp.max(jnp.abs(ref))))
        assert rel < 0.03  # int8 weight rounding x3 matmuls, bf16 h

    def test_cache_update_small_dims(self):
        # regression: Mosaic 'unsupported shape cast' on (3,1,4,32) expand
        from flash_attention_softmax_n_tpu.kernels.cache_update import (
            cache_append,
        )
        nl, b, kvh, s, hd = 3, 4, 4, 64, 32
        kc = jnp.zeros((nl, b, kvh, s, hd), jnp.bfloat16)
        rows = jax.random.normal(jax.random.PRNGKey(0), (nl, b, kvh, hd),
                                 jnp.bfloat16)
        pos = jnp.asarray([0, 7, 33, 63], jnp.int32)
        (out,) = jax.jit(lambda c: cache_append((c,), (rows,), pos))(kc)
        got = out[:, jnp.arange(b), :, pos, :]
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(jnp.swapaxes(rows, 0, 1)),
                                   atol=1e-2)

    def test_decode_attention_dense_and_int8(self):
        # regression: batched-dot scoped-VMEM overflow at block_s=512
        from flash_attention_softmax_n_tpu.kernels.decode_attention import (
            decode_attention_n,
        )
        from flash_attention_softmax_n_tpu.ops.functional import softmax_n
        from flash_attention_softmax_n_tpu.quant.kv_cache import quantize_kv
        B, H, HD, S = 8, 16, 128, 512
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, HD), jnp.bfloat16)
        k = 0.3 * jax.random.normal(ks[1], (B, H, S, HD), jnp.bfloat16)
        v = 0.3 * jax.random.normal(ks[2], (B, H, S, HD), jnp.bfloat16)
        lens = jnp.asarray([100, 512, 3, 257, 1, 64, 300, 511], jnp.int32)
        sc = HD ** -0.5
        scores = jnp.einsum("bhe,bhse->bhs", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * sc
        valid = jnp.arange(S)[None, None, :] < lens[:, None, None]
        p = softmax_n(jnp.where(valid, scores, -1e30), n=1.0, axis=-1)
        ref = jnp.einsum("bhs,bhse->bhe", p, v.astype(jnp.float32))
        o = jax.jit(lambda q: decode_attention_n(
            q, k, v, lens, softmax_n_param=1.0, scale=sc,
            implementation="pallas"))(q)
        assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref))) < 0.01
        kq, ksc = quantize_kv(k, 8)
        vq, vsc = quantize_kv(v, 8)
        o8 = jax.jit(lambda q: decode_attention_n(
            q, kq, vq, lens, k_scales=ksc, v_scales=vsc, softmax_n_param=1.0,
            scale=sc, implementation="pallas"))(q)
        assert float(jnp.max(jnp.abs(o8.astype(jnp.float32) - ref))) < 0.02

    def test_flash_attention_fwd_bwd_hd64_unpadded(self):
        # regression guard: sub-128 head dims run with last block dim ==
        # array dim (no lane padding) — a distinct Mosaic lowering path
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        from flash_attention_softmax_n_tpu.ops.functional import (
            slow_attention_n,
        )
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = 0.3 * jax.random.normal(ks[0], (2, 4, 512, 64), jnp.float32)
        k = 0.3 * jax.random.normal(ks[1], (2, 4, 512, 64), jnp.float32)
        v = 0.3 * jax.random.normal(ks[2], (2, 4, 512, 64), jnp.float32)
        gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention_n(
            q, k, v, softmax_n_param=1.0, is_causal=True,
            implementation="pallas") ** 2), (0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(slow_attention_n(
            q, k, v, softmax_n_param=1.0, is_causal=True) ** 2),
            (0, 1, 2)))(q, k, v)
        for a, b in zip(gf, gr):
            assert float(jnp.max(jnp.abs(a - b))) < 5e-3

    def test_flash_attention_fwd_bwd(self):
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        from flash_attention_softmax_n_tpu.ops.functional import (
            slow_attention_n,
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = 0.3 * jax.random.normal(ks[0], (2, 4, 1024, 128), jnp.float32)
        k = 0.3 * jax.random.normal(ks[1], (2, 4, 1024, 128), jnp.float32)
        v = 0.3 * jax.random.normal(ks[2], (2, 4, 1024, 128), jnp.float32)
        gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention_n(
            q, k, v, softmax_n_param=1.0, is_causal=True,
            implementation="pallas") ** 2), (0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(slow_attention_n(
            q, k, v, softmax_n_param=1.0, is_causal=True) ** 2),
            (0, 1, 2)))(q, k, v)
        for a, b in zip(gf, gr):
            # TPU f32 matmuls run through bf16 passes; tolerance reflects it
            assert float(jnp.max(jnp.abs(a - b))) < 5e-3
