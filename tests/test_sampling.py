"""ops/sampling.py: per-row temperature / top-k / top-p sampling.

The op is the engine's whole sampling layer (reference has none —
north-star serving capability), so the invariants that make it safe to
batch heterogeneous requests are tested directly:

  * temperature 0 rows are exact argmax regardless of k/p;
  * top_k=1 is the greedy fixed point even at high temperature;
  * truncation: with top_k=k only the k highest-logit tokens can ever be
    emitted; with top_p=p only the minimal prefix covering mass p;
  * per-row settings are independent within one batch (one executable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu.ops.sampling import sample_tokens


@pytest.fixture(scope="module")
def logits():
    return jax.random.normal(jax.random.PRNGKey(0), (4, 64)) * 3.0


def _many(logits, temps, top_k=None, top_p=None, n=200):
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    f = jax.vmap(lambda k: sample_tokens(logits, k, temps, top_k, top_p))
    return np.asarray(jax.jit(f)(keys))  # (n, B)


class TestSampleTokens:
    def test_zero_temperature_is_argmax(self, logits):
        temps = jnp.zeros(4)
        out = _many(logits, temps, n=8)
        expected = np.asarray(jnp.argmax(logits, axis=-1))
        assert (out == expected[None, :]).all()

    def test_zero_temperature_ignores_truncation(self, logits):
        temps = jnp.zeros(4)
        out = _many(logits, temps, top_k=jnp.full(4, 3, jnp.int32),
                    top_p=jnp.full(4, 0.5), n=8)
        expected = np.asarray(jnp.argmax(logits, axis=-1))
        assert (out == expected[None, :]).all()

    def test_top_k_one_is_greedy(self, logits):
        temps = jnp.full(4, 5.0)
        out = _many(logits, temps, top_k=jnp.ones(4, jnp.int32))
        expected = np.asarray(jnp.argmax(logits, axis=-1))
        assert (out == expected[None, :]).all()

    def test_tiny_top_p_is_greedy(self, logits):
        temps = jnp.full(4, 5.0)
        out = _many(logits, temps, top_p=jnp.full(4, 1e-6))
        expected = np.asarray(jnp.argmax(logits, axis=-1))
        assert (out == expected[None, :]).all()

    def test_top_k_truncates_support(self, logits):
        k = 4
        temps = jnp.full(4, 10.0)  # near-uniform over the kept set
        out = _many(logits, temps, top_k=jnp.full(4, k, jnp.int32))
        allowed = np.asarray(jnp.argsort(-logits, axis=-1)[:, :k])
        for b in range(4):
            assert set(out[:, b]) <= set(allowed[b])
            # high temperature should actually visit more than one token
            assert len(set(out[:, b])) > 1

    def test_top_p_truncates_support(self, logits):
        temps = jnp.ones(4)
        p = 0.7
        out = _many(logits, temps, top_p=jnp.full(4, p))
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        order = np.argsort(-probs, axis=-1)
        for b in range(4):
            sp = probs[b][order[b]]
            # minimal prefix whose mass strictly before each kept token < p
            n_keep = int(np.sum(np.cumsum(sp) - sp < p))
            assert set(out[:, b]) <= set(order[b][:n_keep])

    def test_disabled_rows_cover_full_support(self, logits):
        # k<=0 and p>=1 disable truncation: with huge temperature the row
        # behaves uniformly over the whole vocab
        temps = jnp.full(4, 1e6)
        out = _many(logits, temps, top_k=jnp.zeros(4, jnp.int32),
                    top_p=jnp.full(4, 1.0), n=500)
        for b in range(4):
            assert len(set(out[:, b])) > 40  # of 64, near-uniform

    def test_rows_are_independent(self, logits):
        # row 0 greedy, row 1 top_k=1 (greedy fixed point), row 2 nucleus,
        # row 3 unrestricted — mixed settings in ONE call
        temps = jnp.asarray([0.0, 3.0, 1.0, 1.0])
        ks = jnp.asarray([0, 1, 0, 0], jnp.int32)
        ps = jnp.asarray([1.0, 1.0, 0.6, 1.0])
        out = _many(logits, temps, top_k=ks, top_p=ps)
        expected = np.asarray(jnp.argmax(logits, axis=-1))
        assert (out[:, 0] == expected[0]).all()
        assert (out[:, 1] == expected[1]).all()
        probs = np.asarray(jax.nn.softmax(logits[2]))
        order = np.argsort(-probs)
        n_keep = int(np.sum(np.cumsum(probs[order]) - probs[order] < 0.6))
        assert set(out[:, 2]) <= set(order[:n_keep])

    def test_top_k_then_top_p_composes_hf_order(self):
        # HF warper order: top-k truncates, top-p measures mass on the
        # RENORMALIZED k-truncated row. probs [0.4,0.3,0.2,0.1], k=2,
        # p=0.55: after k the top-2 renormalize to [0.571,0.429] and
        # token1 is dropped (mass before it 0.571 >= 0.55) — only the
        # argmax survives. Measuring p on the full row would keep token1.
        base = jnp.log(jnp.asarray([[0.4, 0.3, 0.2, 0.1]]))
        temps = jnp.ones(1)
        out = _many(base, temps, top_k=jnp.asarray([2], jnp.int32),
                    top_p=jnp.asarray([0.55]), n=100)
        assert set(out[:, 0]) == {0}

    def test_fast_path_matches_distribution(self, logits):
        # the sort-free path (k/p None) must agree with categorical
        temps = jnp.full(4, 1.0)
        key = jax.random.PRNGKey(7)
        fast = sample_tokens(logits, key, temps)
        ref = jax.random.categorical(key, logits, axis=-1)
        assert (np.asarray(fast) == np.asarray(ref)).all()
