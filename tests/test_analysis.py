"""Tests for the analysis subsystem (moments, streaming stats, weight stats, IO).

Mirrors the reference's strategy (tests/cpu/analysis/): moment functions
validated against known distributions (normal excess kurtosis 0, uniform
-1.2, lognormal skewness > 0), hook selection semantics, streaming
n_samples accounting, and weight-statistics shapes — re-expressed for the
functional/jit collector.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu.analysis import (
    activation_stats_to_dict,
    compute_weight_statistics,
    init_activation_stats,
    kurtosis,
    kurtosis_batch_mean,
    register_activation_hooks,
    save_results,
    skewness,
    skewness_batch_mean,
    std,
    update_activation_stats,
    variance,
    variance_batch_mean,
)


class TestMoments:
    def test_normal_distribution(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (200_000,)) * 2.0 + 1.0
        np.testing.assert_allclose(float(variance(x)), 4.0, rtol=0.05)
        np.testing.assert_allclose(float(std(x)), 2.0, rtol=0.02)
        assert abs(float(skewness(x))) < 0.05
        assert abs(float(kurtosis(x))) < 0.08  # excess kurtosis ~ 0

    def test_uniform_distribution(self):
        x = jax.random.uniform(jax.random.PRNGKey(1), (200_000,))
        np.testing.assert_allclose(float(variance(x)), 1 / 12, rtol=0.05)
        assert abs(float(skewness(x))) < 0.05
        np.testing.assert_allclose(float(kurtosis(x)), -1.2, atol=0.05)

    def test_lognormal_positive_skew(self):
        x = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (100_000,)))
        assert float(skewness(x)) > 1.0
        assert float(kurtosis(x)) > 3.0

    def test_batch_mean_variants_match_uniform_rows(self):
        # every row identical distribution -> batch-mean ~ global stat
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 50_000))
        np.testing.assert_allclose(float(variance_batch_mean(x)), 1.0, rtol=0.05)
        assert abs(float(skewness_batch_mean(x))) < 0.05
        assert abs(float(kurtosis_batch_mean(x))) < 0.1

    def test_jittable(self):
        f = jax.jit(lambda x: (kurtosis(x), skewness(x)))
        k, s = f(jax.random.normal(jax.random.PRNGKey(4), (1000,)))
        assert jnp.isfinite(k) and jnp.isfinite(s)


class TestActivationStats:
    def _apply_fn(self, x):
        # toy model producing two taps
        h = x * 2.0
        taps = {
            "layer0.attention.output": h,
            "layer0.mlp": h + 1.0,
        }
        return h, taps

    def test_default_selection_matches_pattern(self):
        hooked, stats0 = register_activation_hooks(
            self._apply_fn, ["layer0.attention.output", "layer0.mlp"])
        assert set(stats0) == {"layer0.attention.output"}

    def test_explicit_selection(self):
        hooked, stats0 = register_activation_hooks(
            self._apply_fn, ["layer0.attention.output", "layer0.mlp"],
            layers_to_save=["layer0.mlp"])
        assert set(stats0) == {"layer0.mlp"}

    def test_unknown_layer_warns(self):
        with pytest.warns(UserWarning):
            register_activation_hooks(
                self._apply_fn, ["layer0.mlp"], layers_to_save=["nope"])

    def test_streaming_accounting(self):
        hooked, stats = register_activation_hooks(
            self._apply_fn, ["layer0.attention.output", "layer0.mlp"])
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        for _ in range(3):
            _, stats = hooked(stats, x)
        d = activation_stats_to_dict(stats)
        assert d["layer0.attention.output"]["n_samples"] == 12

    def test_streaming_converges_to_true_stat(self):
        # feed identical-distribution batches; running mean/variance converge
        stats = init_activation_stats(["t"])
        rng = jax.random.PRNGKey(0)
        upd = jax.jit(update_activation_stats)
        for i in range(20):
            rng, sub = jax.random.split(rng)
            batch = 3.0 * jax.random.normal(sub, (8, 4096)) + 0.5
            stats = upd(stats, {"t": batch})
        d = activation_stats_to_dict(stats)
        np.testing.assert_allclose(d["t"]["mean"], 0.5, atol=0.05)
        np.testing.assert_allclose(d["t"]["variance"], 9.0, rtol=0.05)
        assert abs(d["t"]["kurtosis"]) < 0.2

    def test_streaming_weighted_average_formula(self):
        # one batch of B1 then B2: result = (B1*s1 + B2*s2) / (B1+B2) for mean
        stats = init_activation_stats(["t"])
        b1 = jnp.ones((2, 4)) * 10.0
        b2 = jnp.ones((6, 4)) * 2.0
        stats = update_activation_stats(stats, {"t": b1})
        stats = update_activation_stats(stats, {"t": b2})
        d = activation_stats_to_dict(stats)
        np.testing.assert_allclose(d["t"]["mean"], (2 * 10 + 6 * 2) / 8, atol=1e-5)

    def test_unknown_tap_ignored(self):
        stats = init_activation_stats(["a"])
        out = update_activation_stats(stats, {"b": jnp.ones((2, 2))})
        assert set(out) == {"a"}

    def test_jittable_update(self):
        stats = init_activation_stats(["a"])
        f = jax.jit(update_activation_stats)
        out = f(stats, {"a": jnp.ones((2, 8))})
        assert int(out["a"]["n_samples"]) == 2


class TestWeightStats:
    def test_pytree_walk(self):
        params = {
            "layer0": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (64, 64)),
                       "bias": jnp.zeros((64,))},
        }
        stats = compute_weight_statistics(params)
        assert set(stats) == {"layer0/kernel", "layer0/bias"}
        assert stats["layer0/kernel"]["n_weights"] == 64 * 64
        assert abs(stats["layer0/kernel"]["kurtosis"]) < 0.5
        for key in ("kurtosis", "skewness", "variance", "mean"):
            assert isinstance(stats["layer0/kernel"][key], float)


class TestIO:
    def test_save_results_roundtrip(self, tmp_path):
        results = {"activations": {"l0": {"mean": 0.5}}, "weights": {}}
        path = save_results(results, "mymodel", directory=str(tmp_path))
        assert path.name == "mymodel.json"
        with open(path) as f:
            loaded = json.load(f)
        assert loaded == results
        # indent=4 format parity with the reference io.py:13
        assert "    " in path.read_text()


class TestPerplexity:
    """analysis/evaluate.py: the Δppl-vs-fp16 instrument (BASELINE metric)."""

    def _model(self):
        from flash_attention_softmax_n_tpu.models import (
            DecoderConfig, init_decoder_params,
        )
        cfg = DecoderConfig(
            vocab_size=61, d_model=32, n_layers=2, n_heads=4, n_kv_heads=4,
            d_ff=64, max_seq_len=32, softmax_n=1.0, dtype=jnp.float32,
            attn_implementation="xla")
        return cfg, init_decoder_params(cfg, jax.random.PRNGKey(0))

    def test_uniform_model_matches_log_vocab(self):
        # zeroed lm_head -> uniform logits -> ppl == vocab_size
        from flash_attention_softmax_n_tpu.analysis import perplexity
        cfg, params = self._model()
        params = dict(params, lm_head=jnp.zeros_like(params["lm_head"]))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                  cfg.vocab_size)
        ppl = perplexity(params, cfg, [toks])
        assert abs(ppl - cfg.vocab_size) / cfg.vocab_size < 1e-4

    def test_mask_excludes_padding(self):
        from flash_attention_softmax_n_tpu.analysis import token_nll
        cfg, params = self._model()
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0,
                                  cfg.vocab_size)
        full_nll, full_n = token_nll(params, cfg, toks)
        mask = jnp.arange(16)[None, :] < 8
        part_nll, part_n = token_nll(params, cfg, toks, mask)
        assert int(full_n) == 15 and int(part_n) == 7
        assert float(part_nll) < float(full_nll)

    def test_delta_perplexity_int8_small(self):
        from flash_attention_softmax_n_tpu.analysis import delta_perplexity
        from flash_attention_softmax_n_tpu.quant import (
            quantize_decoder_weights,
        )
        cfg, params = self._model()
        qparams = quantize_decoder_weights(params, bits=8)
        toks = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0,
                                  cfg.vocab_size)
        out = delta_perplexity(params, qparams, cfg, [toks])
        assert out["ppl_dense"] > 1.0
        # int8 weight-only on a random init: ppl moves by well under 5%
        assert abs(out["relative"]) < 0.05


class TestXLNetAnalysisIntegration:
    """The measurement workflow over the XLNet taps: collect streaming
    activation stats from xlnet_forward(collect_taps=True) and run the
    quantization gate — the reference's XLNet outlier study end-to-end."""

    def test_xlnet_taps_to_gate_report(self):
        from flash_attention_softmax_n_tpu.models.xlnet import (
            XLNetConfig,
            init_xlnet_params,
            xlnet_forward,
        )
        from flash_attention_softmax_n_tpu.quant import gate_report

        cfg = XLNetConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                          d_head=16, d_inner=64, softmax_n=1.0)
        params = init_xlnet_params(cfg, jax.random.PRNGKey(0))
        names = [f"layer.{i}.rel_attn.output" for i in range(2)]

        def apply_fn(ids):
            out, taps = xlnet_forward(params, cfg, ids, collect_taps=True)
            return out["last_hidden_state"], taps

        hooked, stats = register_activation_hooks(apply_fn, names,
                                                  layers_to_save=names)
        rng = np.random.RandomState(0)
        for _ in range(2):
            ids = jnp.asarray(rng.randint(0, 64, size=(2, 8)), jnp.int32)
            _, stats = hooked(stats, ids)
        d = activation_stats_to_dict(stats)
        assert d[names[0]]["n_samples"] == 4
        report = gate_report(d)
        assert set(report) == set(names)
        for entry in report.values():
            assert {"kurtosis", "int8_ok", "int4_ok", "fp8_ok"} <= set(entry)


class TestAttentionProbabilityStats:
    """Round-3: measuring the softmax-N mechanism directly on the
    probabilities the models expose via output_attentions — the phantom
    key's mass is the 'attention to nothing' the reference's motivating
    paper is about (README.md:4)."""

    def test_null_mass_zero_for_softmax0(self):
        import jax
        from flash_attention_softmax_n_tpu.analysis import (
            null_attention_mass,
        )
        from flash_attention_softmax_n_tpu.ops.functional import softmax_n
        s = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 8))
        p0 = softmax_n(s, n=0.0, axis=-1)
        np.testing.assert_allclose(null_attention_mass(p0),
                                   np.zeros((2, 3, 4)), atol=1e-6)

    def test_null_mass_analytic(self):
        # constant scores 0 over S keys with n: mass = n / (n + S)
        from flash_attention_softmax_n_tpu.analysis import (
            null_attention_mass,
        )
        from flash_attention_softmax_n_tpu.ops.functional import softmax_n
        S, n = 8, 4.0
        p = softmax_n(jnp.zeros((1, S)), n=n, axis=-1)
        np.testing.assert_allclose(null_attention_mass(p),
                                   [n / (n + S)], rtol=1e-6)

    def test_entropy_uniform_with_phantom(self):
        from flash_attention_softmax_n_tpu.analysis import attention_entropy
        from flash_attention_softmax_n_tpu.ops.functional import softmax_n
        # n=1, S keys at score 0 -> S+1 equally-likely outcomes
        S = 7
        p = softmax_n(jnp.zeros((1, S)), n=1.0, axis=-1)
        np.testing.assert_allclose(attention_entropy(p),
                                   [np.log(S + 1)], rtol=1e-5)

    def test_summarize_from_model_output(self):
        import jax
        from flash_attention_softmax_n_tpu.analysis import (
            summarize_attention,
        )
        from flash_attention_softmax_n_tpu.models import (
            DecoderConfig, decoder_forward, init_decoder_params,
        )
        cfg = DecoderConfig(
            vocab_size=61, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
            d_ff=64, max_seq_len=32, softmax_n=1.0, dtype=jnp.float32,
            attn_implementation="xla")
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 61)
        _, probs = decoder_forward(params, cfg, tokens,
                                   output_attentions=True)
        stats = summarize_attention(probs)
        assert stats["null_mass_mean"].shape == (2, 4)
        m = np.asarray(stats["null_mass_mean"])
        assert (m > 0).all() and (m < 1).all()  # softmax-1: real null mass
        assert (np.asarray(stats["null_mass_max"]) >= m - 1e-6).all()
        with pytest.raises(ValueError, match="attention"):
            summarize_attention(jnp.zeros((3, 4, 5)))
