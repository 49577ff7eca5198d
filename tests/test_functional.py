"""Tests for softmax_n and slow_attention_n (the oracle layer).

Ports the reference's test strategy (tests/cpu/core/test_functional.py):
hand-computed softmax values, the overflow input [12, 89, 710], equivalence
of slow_attention_n at n=0 with a standard-softmax implementation (forward
and gradients), causal/bool/float-mask behavior, and the analytic constant-
input oracle.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu import (
    flash_attention_n,
    slow_attention_n,
    softmax_n,
)
from tests.common import (
    attention_analytic_answer,
    attention_analytic_causal_answer,
    constant_qkv,
    get_query_key_value,
)


class TestSoftmaxN:
    def test_matches_standard_softmax_at_n0(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 9))
        np.testing.assert_allclose(
            softmax_n(x, 0.0), jax.nn.softmax(x, axis=-1), atol=1e-6
        )
        np.testing.assert_allclose(
            softmax_n(x), jax.nn.softmax(x, axis=-1), atol=1e-6
        )

    @pytest.mark.parametrize("n", [0.0, 1e-6, 1e-3, 1.0, 4.0])
    def test_matches_float64_formula(self, n):
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (3, 5, 8)), np.float64
        )
        expected = np.exp(x) / (n + np.exp(x).sum(-1, keepdims=True))
        np.testing.assert_allclose(
            softmax_n(jnp.asarray(x, jnp.float32), n), expected, atol=1e-6
        )

    def test_overflow_input(self):
        # exp(710) overflows float64; the shifted form must stay finite
        # (reference test_functional.py overflow case [12, 89, 710]).
        x = jnp.asarray([12.0, 89.0, 710.0])
        for n in (0.0, 1.0, 4.0):
            out = softmax_n(x, n)
            assert bool(jnp.all(jnp.isfinite(out)))
            np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-6)

    def test_deeply_negative_rows_stay_finite(self):
        # round-5 regression (found at 181M scale, n=0 step-6000 decode):
        # a row whose max is < -88.7 (f32 exp overflow of -rowmax) made
        # the reference form's `n * exp(-shift)` term 0 * inf = NaN at
        # n = 0, and inf at n > 0. The n=0 branch must skip the term
        # (softmax-0 is shift-invariant) and n>0 clamps the shift at 0
        # (the phantom key's score — same m0 = 0 as the fused kernel).
        x = jnp.asarray([[-91.9, -1e30, -1e30, -95.0]], jnp.float32)
        p0 = softmax_n(x, 0.0)
        assert bool(jnp.all(jnp.isfinite(p0)))
        np.testing.assert_allclose(
            p0[0, 0], 1.0 / (1.0 + np.exp(-95.0 + 91.9)), rtol=1e-5)
        p1 = softmax_n(x, 1.0)
        assert bool(jnp.all(jnp.isfinite(p1)))
        # with n = 1 the phantom key absorbs ~all mass: probs ~ exp(x)
        assert float(jnp.max(p1)) < 1e-30

    def test_denominator_includes_n(self):
        x = jnp.zeros((1, 4))
        # all-equal logits: each prob = 1 / (n * exp(0) + 4)
        np.testing.assert_allclose(softmax_n(x, 1.0), np.full((1, 4), 0.2), atol=1e-6)
        np.testing.assert_allclose(softmax_n(x, 4.0), np.full((1, 4), 0.125), atol=1e-6)

    def test_rows_sum_below_one(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (6, 11))
        s = jnp.sum(softmax_n(x, 2.0), axis=-1)
        assert bool(jnp.all(s < 1.0))

    def test_axis_and_dtype(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 5))
        out = softmax_n(x, 1.0, axis=0, dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
        ref = softmax_n(x.T, 1.0, axis=-1).T.astype(jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=1e-2)

    def test_gradient_finite_and_correct(self):
        # d/dx_i of softmax_n must match numerical finite differences.
        x = jax.random.normal(jax.random.PRNGKey(4), (5,))
        f = lambda x: jnp.sum(softmax_n(x, 1.0) ** 2)
        g = jax.grad(f)(x)
        eps = 1e-3
        for i in range(5):
            xp = x.at[i].add(eps)
            xm = x.at[i].add(-eps)
            num = (f(xp) - f(xm)) / (2 * eps)
            np.testing.assert_allclose(g[i], num, atol=1e-3)


class TestSlowAttentionN:
    def test_equivalence_with_standard_softmax_at_n0(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(0), (2, 3), 17, 8)
        out = slow_attention_n(q, k, v, softmax_n_param=0.0)
        w = jax.nn.softmax(
            jnp.einsum("...le,...se->...ls", q, k) / math.sqrt(8), axis=-1
        )
        expected = jnp.einsum("...ls,...sv->...lv", w, v)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_gradients_at_n0(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(1), 2, 9, 4)

        def ours(q, k, v):
            return jnp.sum(slow_attention_n(q, k, v, softmax_n_param=0.0) ** 2)

        def ref(q, k, v):
            w = jax.nn.softmax(
                jnp.einsum("...le,...se->...ls", q, k) / math.sqrt(4), axis=-1
            )
            return jnp.sum(jnp.einsum("...ls,...sv->...lv", w, v) ** 2)

        g0 = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
        g1 = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(a, b, atol=1e-6)

    @pytest.mark.parametrize("n", [0.0, 1.0, 4.0])
    @pytest.mark.parametrize("weight", [2.0, 1.0, 0.5, 0.1])
    def test_analytic_unmasked(self, n, weight):
        q, k, v = constant_qkv(3, 12, 16, 8, 6, weight)
        out = slow_attention_n(q, k, v, softmax_n_param=n)
        expected = attention_analytic_answer(3, 12, 16, 8, 6, 1 / math.sqrt(8),
                                             weight, n)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    @pytest.mark.parametrize("n", [0.0, 1.0, 4.0])
    def test_analytic_causal_rectangular(self, n):
        # S > L: rectangular causal via tril(diagonal=S-L).
        weight = 0.5
        q, k, v = constant_qkv(2, 10, 14, 8, 8, weight)
        out = slow_attention_n(q, k, v, is_causal=True, softmax_n_param=n)
        expected = attention_analytic_causal_answer(2, 10, 14, 8, 8,
                                                    1 / math.sqrt(8), weight, n)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_bool_mask_matches_float_mask(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(2), 2, 7, 8)
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (2, 7, 7))
        # guarantee no fully-masked row
        mask = mask.at[:, :, 0].set(True)
        out_bool = slow_attention_n(q, k, v, attn_mask=mask, softmax_n_param=1.0)
        fmask = jnp.where(mask, 0.0, -jnp.inf).astype(q.dtype)
        out_float = slow_attention_n(q, k, v, attn_mask=fmask, softmax_n_param=1.0)
        np.testing.assert_allclose(out_bool, out_float, atol=1e-6)

    def test_causal_and_mask_mutually_exclusive(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(4), 1, 5, 4)
        with pytest.raises(ValueError):
            slow_attention_n(q, k, v, attn_mask=jnp.ones((5, 5), bool),
                             is_causal=True)

    def test_dropout_changes_output_and_eval_does_not(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(5), 2, 9, 8)
        base = slow_attention_n(q, k, v)
        dropped = slow_attention_n(q, k, v, dropout_p=0.5,
                                   dropout_rng=jax.random.PRNGKey(0))
        assert not bool(jnp.allclose(base, dropped))
        eval_out = slow_attention_n(q, k, v, dropout_p=0.5, train=False)
        np.testing.assert_allclose(base, eval_out, atol=1e-6)

    def test_ev_not_equal_e(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(6), 2, 9, 8,
                                      kv_seq_len=11, v_embed_dim=3)
        out = slow_attention_n(q, k, v, softmax_n_param=1.0)
        assert out.shape == (2, 9, 3)

    def test_softmax_dtype(self):
        q, k, v = get_query_key_value(jax.random.PRNGKey(7), 2, 9, 8)
        out = slow_attention_n(q, k, v, softmax_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16


class TestBaselineParityAnchor:
    """BASELINE.json configs[0]: the reference README's exact example shapes
    (README.md:114-130) — q (6,1024,64), kv (6,1152,64) with Ev=32, n=1,
    no mask, fp32. slow_attention_n is checked against an independent
    numpy-computed softmax-N attention, and the fused path against it."""

    def _inputs(self):
        ks = jax.random.split(jax.random.PRNGKey(42), 3)
        q = jax.random.normal(ks[0], (6, 1024, 64), jnp.float32)
        k = jax.random.normal(ks[1], (6, 1152, 64), jnp.float32)
        v = jax.random.normal(ks[2], (6, 1152, 32), jnp.float32)
        return q, k, v

    def test_slow_attention_matches_numpy(self):
        import numpy as np

        q, k, v = self._inputs()
        out = slow_attention_n(q, k, v, softmax_n_param=1.0)
        qn, kn, vn = np.asarray(q), np.asarray(k), np.asarray(v)
        scores = qn @ kn.transpose(0, 2, 1) / np.sqrt(64.0)
        shift = scores.max(-1, keepdims=True)
        e = np.exp(scores - shift)
        denom = 1.0 * np.exp(-shift) + e.sum(-1, keepdims=True)
        ref = (e / denom) @ vn
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_fused_path_matches_oracle(self):
        import numpy as np

        q, k, v = self._inputs()
        ref = slow_attention_n(q, k, v, softmax_n_param=1.0)
        out = flash_attention_n(q, k, v, softmax_n_param=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)
