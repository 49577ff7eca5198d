"""Checkpoint round-trip and profiling utility tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu.models import (
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
)
from flash_attention_softmax_n_tpu.quant import QTensor, quantize_decoder_weights
from flash_attention_softmax_n_tpu.utils import (
    attention_roofline,
    load_checkpoint,
    save_checkpoint,
)

TINY = DecoderConfig(
    vocab_size=97, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
    d_ff=64, max_seq_len=64, softmax_n=1.0, dtype=jnp.float32,
    attn_implementation="xla",
)


class TestCheckpoint:
    def test_roundtrip_dense(self, tmp_path):
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        save_checkpoint(tmp_path / "ckpt", TINY, params,
                        metadata={"surgery": {"softmax_n": 1.0}})
        cfg, restored, meta = load_checkpoint(tmp_path / "ckpt")
        assert cfg == TINY
        assert cfg.softmax_n == 1.0  # surgery persists in the checkpoint
        assert meta["surgery"]["softmax_n"] == 1.0
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 97)
        np.testing.assert_allclose(decoder_forward(restored, cfg, tokens),
                                   decoder_forward(params, TINY, tokens),
                                   atol=1e-6)

    def test_roundtrip_bf16(self, tmp_path):
        cfg = dataclasses.replace(TINY, dtype=jnp.bfloat16)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        save_checkpoint(tmp_path / "ckpt", cfg, params)
        cfg2, restored, _ = load_checkpoint(tmp_path / "ckpt")
        assert cfg2.dtype == jnp.bfloat16
        assert restored["embed"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(restored["embed"].view(jnp.uint16)),
            np.asarray(params["embed"].view(jnp.uint16)))

    @pytest.mark.parametrize("bits", [8, 4])
    def test_roundtrip_quantized(self, tmp_path, bits):
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        qparams = quantize_decoder_weights(params, bits=bits)
        save_checkpoint(tmp_path / "q", TINY, qparams)
        _, restored, _ = load_checkpoint(tmp_path / "q")
        assert isinstance(restored["layers"]["wq"], QTensor)
        assert restored["layers"]["wq"].bits == bits
        np.testing.assert_array_equal(
            np.asarray(restored["layers"]["wq"].values),
            np.asarray(qparams["layers"]["wq"].values))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 97)
        np.testing.assert_allclose(decoder_forward(restored, TINY, tokens),
                                   decoder_forward(qparams, TINY, tokens),
                                   atol=1e-5)


class TestTrainCheckpoint:
    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        # checkpoint/resume invariant: save at step 2, restore, continue —
        # steps 3..4 must be bit-identical to the uninterrupted run. The
        # save happens from a ZeRO-1 TP x DP SHARDED state (host-gather on
        # save, re-shard on restore), the strongest round-trip.
        import optax
        from flash_attention_softmax_n_tpu.parallel import make_train_step
        from flash_attention_softmax_n_tpu.parallel.mesh import make_mesh
        from flash_attention_softmax_n_tpu.utils import (
            load_train_checkpoint,
            save_train_checkpoint,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh({"data": 4, "model": 2})
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
        tx = optax.adamw(1e-2)

        def run(n, start_params, start_opt):
            init, step = make_train_step(TINY, mesh, optimizer=tx,
                                         zero1=True)
            if start_opt is None:
                p, o = init(start_params)
            else:
                # restored host arrays: the step's in_shardings re-shard
                # them (params via init, opt state via zero1 specs)
                p, o = init(start_params)[0], start_opt
            ls = []
            for _ in range(n):
                p, o, loss = step(p, o, tokens)
                ls.append(float(loss))
            return p, o, ls

        params0 = init_decoder_params(TINY, jax.random.PRNGKey(0))
        _, _, straight = run(4, params0, None)

        p2, o2, first2 = run(2, params0, None)
        save_train_checkpoint(tmp_path / "tc", TINY, p2, o2, step=2,
                              metadata={"run": "test"})
        cfg, p_r, o_r, step_r, meta = load_train_checkpoint(
            tmp_path / "tc", optimizer=tx)
        assert cfg == TINY and step_r == 2 and meta["run"] == "test"
        _, _, resumed = run(2, p_r, o_r)
        np.testing.assert_allclose(first2 + resumed, straight, rtol=1e-6)

    def test_wrong_optimizer_rejected(self, tmp_path):
        import optax
        from flash_attention_softmax_n_tpu.utils import (
            load_train_checkpoint,
            save_train_checkpoint,
        )

        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        tx = optax.adamw(1e-3)
        save_train_checkpoint(tmp_path / "tc", TINY, params,
                              tx.init(params))
        with pytest.raises(ValueError, match="optimizer"):
            load_train_checkpoint(tmp_path / "tc", optimizer=optax.sgd(1e-3))


class TestRoofline:
    def test_memory_bound_decode(self):
        # decode (q_len=1) is memory bound
        r = attention_roofline(8, 16, 1, 2048, 128)
        assert r["bound"] == "memory"

    def test_compute_bound_prefill(self):
        r = attention_roofline(8, 16, 4096, 4096, 128, causal=True)
        assert r["bound"] == "compute"
        assert r["sol_time"] > 0

    def test_percent_of_sol(self):
        r = attention_roofline(1, 1, 1024, 1024, 128)
        assert abs(r["percent_of_sol"](r["sol_time"]) - 100.0) < 1e-6


class TestCheckpointModelFamilies:
    """Round-trips for the non-decoder param families (generic pytree I/O
    must cover every model the framework ships)."""

    def test_roundtrip_bert_decoder_mode(self, tmp_path):
        from flash_attention_softmax_n_tpu.models.bert import (
            BertConfig,
            bert_forward,
            init_bert_params,
        )
        cfg = BertConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                         d_ff=64, max_position_embeddings=32,
                         is_decoder=True, add_cross_attention=True)
        params = init_bert_params(cfg, jax.random.PRNGKey(0))
        save_checkpoint(tmp_path / "bert", cfg, params)
        cfg2, restored, _ = load_checkpoint(tmp_path / "bert")
        assert cfg2 == cfg
        ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        enc = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32))
        a = bert_forward(params, cfg, ids, encoder_hidden_states=enc)
        b = bert_forward(restored, cfg2, ids, encoder_hidden_states=enc)
        np.testing.assert_allclose(a["last_hidden_state"],
                                   b["last_hidden_state"], atol=1e-6)

    def test_roundtrip_xlnet(self, tmp_path):
        from flash_attention_softmax_n_tpu.models.xlnet import (
            XLNetConfig,
            init_xlnet_params,
            xlnet_forward,
        )
        cfg = XLNetConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                          d_head=16, d_inner=64)
        params = init_xlnet_params(cfg, jax.random.PRNGKey(0))
        save_checkpoint(tmp_path / "xlnet", cfg, params)
        cfg2, restored, _ = load_checkpoint(tmp_path / "xlnet")
        assert cfg2 == cfg
        ids = jnp.asarray([[5, 6, 7]], jnp.int32)
        a = xlnet_forward(params, cfg, ids)["last_hidden_state"]
        b = xlnet_forward(restored, cfg2, ids)["last_hidden_state"]
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestHbmPreflight:
    """The Mosaic compile-helper crash fence (VERDICT r3 item 5): the
    known-crash 7B-MHA b=48 recipe (int8 W 6.7 GB + int8 KV 6.4 GB ~=
    13.5 GB resident -> opaque 'HTTP 500: subprocess exit code 1',
    artifacts/bench_7b.json) must be refused with a first-party error,
    while every measured-working config passes."""

    def _cfg(self, **kw):
        from flash_attention_softmax_n_tpu.models import DecoderConfig
        return DecoderConfig(**kw)

    def test_known_crash_recipe_refused(self):
        from flash_attention_softmax_n_tpu.utils.profiling import (
            check_decode_hbm_fit,
        )
        cfg7b = self._cfg(vocab_size=32000, d_model=4096, n_layers=32,
                          n_heads=32, n_kv_heads=32, d_ff=11008,
                          max_seq_len=2048)
        w7b = 6_740_000_000  # int8 weights + scales
        with pytest.raises(RuntimeError, match="will not fit HBM"):
            check_decode_hbm_fit(cfg7b, 48, 512, "int8", w7b)
        # the measured-working point at the same geometry passes
        est = check_decode_hbm_fit(cfg7b, 32, 512, "int8", w7b)
        assert est["total"] < 12.5 * 2 ** 30

    def test_known_good_configs_pass(self):
        from flash_attention_softmax_n_tpu.utils.profiling import (
            check_decode_hbm_fit,
        )
        # Llama-3-8B GQA b=96 (runs at 4.9k tok/s, artifacts/bench_7b.json)
        cfg8b = self._cfg(vocab_size=128256, d_model=4096, n_layers=32,
                          n_heads=32, n_kv_heads=8, d_ff=14336,
                          max_seq_len=2048)
        check_decode_hbm_fit(cfg8b, 96, 512, "int8", 8_050_000_000)
        # TinyLlama b=512 int8 headline and b=256 dense baseline
        cfg1b = self._cfg(vocab_size=32000, d_model=2048, n_layers=22,
                          n_heads=32, n_kv_heads=4, d_ff=5632,
                          max_seq_len=2048)
        check_decode_hbm_fit(cfg1b, 512, 512, "int8", 1_100_000_000)
        check_decode_hbm_fit(cfg1b, 1024, 512, "int8", 1_100_000_000)
        check_decode_hbm_fit(cfg1b, 256, 512, None, 2_200_000_000)

    def test_budget_env_override(self, monkeypatch):
        from flash_attention_softmax_n_tpu.utils.profiling import (
            check_decode_hbm_fit,
        )
        cfg = self._cfg(vocab_size=256, d_model=64, n_layers=2, n_heads=4,
                        n_kv_heads=4, d_ff=128, max_seq_len=64)
        monkeypatch.setenv("FASN_HBM_BUDGET_GB", "0.000001")
        with pytest.raises(RuntimeError, match="FASN_HBM_BUDGET_GB"):
            check_decode_hbm_fit(cfg, 2, 64, None, 10_000)
