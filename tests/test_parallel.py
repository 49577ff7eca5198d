"""Multi-device tests on the virtual 8-CPU mesh (SURVEY §4 implication:
DP/TP/ring-attention logic testable without TPU hardware).

Covers: mesh construction, TP-sharded forward equivalence with single-device,
ring attention vs the oracle (softmax-N placement across devices), and the
full sharded train step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_softmax_n_tpu.models import (
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
)
from flash_attention_softmax_n_tpu.ops.functional import slow_attention_n
from flash_attention_softmax_n_tpu.parallel import (
    causal_lm_loss,
    decoder_param_specs,
    make_mesh,
    make_train_step,
    ring_attention_n,
    shard_pytree,
)
from flash_attention_softmax_n_tpu.parallel.mesh import make_hybrid_mesh

TINY = DecoderConfig(
    vocab_size=97, d_model=64, n_layers=2, n_heads=4, n_kv_heads=4,
    d_ff=128, max_seq_len=64, softmax_n=1.0, dtype=jnp.float32,
    attn_implementation="xla",
)


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


class TestMesh:
    def test_make_mesh(self):
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 4})
        assert mesh.shape == {"data": 2, "model": 4}

    def test_too_many_devices_rejected(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 64, "model": 64})

    def test_hybrid_mesh_axes(self):
        require_devices(8)
        mesh = make_hybrid_mesh({"dcn_data": 2}, {"data": 2, "model": 2})
        assert mesh.axis_names == ("dcn_data", "data", "model")
        assert mesh.shape == {"dcn_data": 2, "data": 2, "model": 2}

    def test_hybrid_mesh_too_many_devices(self):
        with pytest.raises(ValueError):
            make_hybrid_mesh({"dcn_data": 64}, {"model": 64})


class TestTensorParallel:
    def test_sharded_forward_matches_single_device(self):
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 4})
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)

        ref = decoder_forward(params, TINY, tokens)

        specs = decoder_param_specs(params)
        sharded = shard_pytree(params, specs, mesh)
        tok_sharded = jax.device_put(
            tokens, NamedSharding(mesh, P("data", None)))
        out = jax.jit(lambda p, t: decoder_forward(p, TINY, t))(
            sharded, tok_sharded)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_quantized_params_shard(self):
        require_devices(8)
        from flash_attention_softmax_n_tpu.quant import quantize_decoder_weights
        mesh = make_mesh({"data": 2, "model": 4})
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        qparams = quantize_decoder_weights(params, bits=8)
        specs = decoder_param_specs(qparams)
        sharded = shard_pytree(qparams, specs, mesh)
        assert sharded["layers"]["wq"].values.sharding.spec == P(
            None, None, "model")


class TestRingAttention:
    @pytest.mark.parametrize("n", [0.0, 1.0])
    @pytest.mark.parametrize("is_causal", [False, True])
    def test_matches_oracle(self, n, is_causal):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, l, e = 2, 2, 64, 32
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks)

        out = jax.jit(lambda q, k, v: ring_attention_n(
            q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=n,
            is_causal=is_causal, implementation="xla"))(q, k, v)
        expected = slow_attention_n(q, k, v, softmax_n_param=n,
                                    is_causal=is_causal)
        np.testing.assert_allclose(out, expected, atol=2e-4,
                                   err_msg=f"n={n} causal={is_causal}")

    @pytest.mark.parametrize("n", [0.0, 1.0])
    def test_grads_match_oracle(self, n):
        # ring attention must train, not just infer: cotangents flow
        # through the scan/ppermute/switch back to q, k, v (VJP of each
        # ring step is another ring step in reverse)
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, l, e = 1, 2, 32, 16
        ks = jax.random.split(jax.random.PRNGKey(2), 4)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks[:3])
        ct = jax.random.normal(ks[3], (b, h, l, e))

        def ring_loss(q, k, v):
            out = ring_attention_n(q, k, v, mesh=mesh, axis_name="sp",
                                   softmax_n_param=n, is_causal=True,
                                   implementation="xla")
            return jnp.sum(out * ct)

        def oracle_loss(q, k, v):
            return jnp.sum(slow_attention_n(q, k, v, softmax_n_param=n,
                                            is_causal=True) * ct)

        got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
        want = jax.grad(oracle_loss, argnums=(0, 1, 2))(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(g, w, atol=2e-4,
                                       err_msg=f"d{name} n={n}")

    def test_gqa_kv_heads_rotate_unrepeated(self):
        # k/v carry fewer heads than q: the ring rotates the small tensors
        # and repeats per block — output and grads must match the oracle
        # over explicitly repeated kv
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, kvh, l, e = 1, 4, 2, 32, 16
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        q = 0.5 * jax.random.normal(ks[0], (b, h, l, e))
        k = 0.5 * jax.random.normal(ks[1], (b, kvh, l, e))
        v = 0.5 * jax.random.normal(ks[2], (b, kvh, l, e))
        ct = jax.random.normal(ks[3], (b, h, l, e))

        def rep(x):
            return jnp.repeat(x, h // kvh, axis=1)

        def ring_loss(q, k, v):
            out = ring_attention_n(q, k, v, mesh=mesh, axis_name="sp",
                                   softmax_n_param=1.0, is_causal=True)
            return jnp.sum(out * ct), out

        def oracle_loss(q, k, v):
            out = slow_attention_n(q, rep(k), rep(v), softmax_n_param=1.0,
                                   is_causal=True)
            return jnp.sum(out * ct), out

        (_, out), got = jax.jit(jax.value_and_grad(
            ring_loss, argnums=(0, 1, 2), has_aux=True))(q, k, v)
        (_, want_out), want = jax.value_and_grad(
            oracle_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        np.testing.assert_allclose(out, want_out, atol=2e-4)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(g, w, atol=2e-4,
                                       err_msg=f"d{name} (gqa)")

    def test_plus_n_applied_once(self):
        # analytic check: constant inputs, unmasked — denominator must be
        # n + S (not n*p + S, which a per-shard +n bug would produce)
        require_devices(4)
        import math
        from tests.common import attention_analytic_answer, constant_qkv
        mesh = make_mesh({"sp": 4})
        w, l, e = 0.5, 64, 32
        q, k, v = constant_qkv((1, 1), l, l, e, e, w)
        out = jax.jit(lambda q, k, v: ring_attention_n(
            q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=4.0,
            is_causal=False, implementation="xla"))(q, k, v)
        expected = attention_analytic_answer((1, 1), l, l, e, e,
                                             1 / math.sqrt(e), w, 4.0)
        np.testing.assert_allclose(out, expected, atol=1e-4)


class TestMeshedFlashAttention:
    """ops/flash_attention with mesh=: the Pallas kernel shard_mapped over
    (batch='data', heads='model') — the TP-clean prefill path that replaces
    the forced O(L^2) XLA attention under mesh (round-1 VERDICT weak #5)."""

    def test_meshed_pallas_matches_unmeshed(self):
        require_devices(8)
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        b, h, l, e = 4, 8, 64, 32
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks)
        mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
        mask = jnp.broadcast_to(mask, (b, 1, l, l))

        ref = flash_attention_n(q, k, v, softmax_n_param=1.0,
                                attn_mask=mask, implementation="pallas")
        out = jax.jit(lambda q, k, v, m: flash_attention_n(
            q, k, v, softmax_n_param=1.0, attn_mask=m,
            implementation="pallas", mesh=mesh))(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_meshed_pallas_grads_match(self):
        # grads through the shard_mapped kernel — incl. the cotangent of a
        # (1,1,L,S) bias replicated over BOTH manual axes, which
        # shard_map's transpose all-reduces ITSELF even under
        # check_vma=False (an explicit psum would double-count by the
        # shard count; see the NOTE in ops/flash_attention.py)
        require_devices(8)
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        b, h, l, e = 2, 4, 32, 16
        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks[:3])
        bias = 0.3 * jax.random.normal(ks[3], (1, 1, l, l))
        ct = jax.random.normal(ks[4], (b, h, l, e))

        def loss(mesh_):
            def f(q, k, v, bias):
                out = flash_attention_n(
                    q, k, v, softmax_n_param=1.0, attn_bias=bias,
                    is_causal=True, implementation="pallas", mesh=mesh_)
                return jnp.sum(out * ct)
            return f

        want = jax.grad(loss(None), argnums=(0, 1, 2, 3))(q, k, v, bias)
        got = jax.jit(jax.grad(loss(mesh), argnums=(0, 1, 2, 3)))(
            q, k, v, bias)
        for g, w, name in zip(got, want, ["dq", "dk", "dv", "dbias"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-4, err_msg=name)

    def test_indivisible_heads_rejected(self):
        require_devices(8)
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        q = jnp.zeros((2, 6, 32, 32))  # 6 heads % 4 != 0
        with pytest.raises(ValueError, match="does not divide"):
            flash_attention_n(q, q, q, implementation="pallas", mesh=mesh)

    def test_indivisible_auto_falls_back_to_xla(self):
        # 'auto' must degrade to the GSPMD XLA path instead of erroring
        require_devices(8)
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        from flash_attention_softmax_n_tpu.ops.functional import (
            slow_attention_n,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (2, 6, 32, 32))
                   for kk in ks)  # 6 heads % 4 != 0
        out = jax.jit(lambda q, k, v: flash_attention_n(
            q, k, v, softmax_n_param=1.0, is_causal=True,
            implementation="auto", mesh=mesh))(q, k, v)
        ref = slow_attention_n(q, k, v, softmax_n_param=1.0, is_causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_meshed_dropout_matches_unsharded(self):
        # round 5 (VERDICT r4 item 7): in-kernel dropout under mesh SPMD.
        # The hash is linear in its batch/head terms, so each shard folds
        # its global (batch, head) base into the seed — the meshed mask
        # must be BIT-identical to the single-device kernel's.
        require_devices(8)
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        b, h, l, e = 4, 8, 64, 32
        ks = jax.random.split(jax.random.PRNGKey(6), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks)
        rng = jax.random.PRNGKey(42)

        def f(mesh_):
            return jax.jit(lambda q, k, v: flash_attention_n(
                q, k, v, softmax_n_param=1.0, is_causal=True,
                dropout_p=0.35, dropout_rng=rng,
                implementation="pallas", mesh=mesh_))

        ref = f(None)(q, k, v)
        out = f(mesh)(q, k, v)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_meshed_dropout_grads_match_oracle(self):
        # grad-parity through the shard_mapped dropout kernel vs the slow
        # jnp oracle evaluating the SAME hash mask at global coordinates
        require_devices(8)
        from flash_attention_softmax_n_tpu.kernels.flash_attention import (
            dropout_keep,
        )
        from flash_attention_softmax_n_tpu.ops.flash_attention import (
            flash_attention_n,
        )
        from flash_attention_softmax_n_tpu.ops.functional import softmax_n

        mesh = make_mesh({"data": 2, "model": 4})
        b, h, l, e = 2, 4, 32, 16
        rate, n = 0.25, 1.0
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks[:3])
        ct = jax.random.normal(ks[3], (b, h, l, e))
        rng = jax.random.PRNGKey(5)
        seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)

        def oracle(q, k, v):
            s = jnp.einsum("bhle,bhse->bhls", q, k) * (e ** -0.5)
            causal = jnp.tril(jnp.ones((l, l), bool))
            s = jnp.where(causal, s, -jnp.inf)
            p = softmax_n(s, n=n, axis=-1)
            coords = [jnp.arange(d, dtype=jnp.int32) for d in (b, h, l, l)]
            bb, hh, qq, kk = jnp.meshgrid(*coords, indexing="ij")
            keep = dropout_keep(seed, bb, hh, qq, kk, rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
            out = jnp.einsum("bhls,bhsv->bhlv", p, v)
            return jnp.sum(out * ct)

        def meshed(q, k, v):
            out = flash_attention_n(
                q, k, v, softmax_n_param=n, is_causal=True,
                dropout_p=rate, dropout_rng=rng,
                implementation="pallas", mesh=mesh)
            return jnp.sum(out * ct)

        want = jax.grad(oracle, argnums=(0, 1, 2))(q, k, v)
        got = jax.jit(jax.grad(meshed, argnums=(0, 1, 2)))(q, k, v)
        for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-4, err_msg=name)

    def test_meshed_engine_prefill_pallas_matches_xla(self):
        # the engine's admission path with the auto (pallas) implementation
        # under mesh must reproduce the unmeshed XLA prefill
        require_devices(8)
        from functools import partial

        from flash_attention_softmax_n_tpu.engine.engine import (
            engine_prefill_batch,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        cfg = dataclasses.replace(TINY, attn_implementation="auto")
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        shape = (cfg.n_layers, 4, cfg.n_kv_heads, 32, cfg.head_dim)
        cache = {"k": jnp.zeros(shape, cfg.dtype),
                 "v": jnp.zeros(shape, cfg.dtype),
                 "lengths": jnp.zeros((4,), jnp.int32)}
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
        true_lens = jnp.asarray([16, 9, 12, 16], jnp.int32)
        slots = jnp.arange(4, dtype=jnp.int32)

        ref_logits, ref_cache = engine_prefill_batch(
            params, dataclasses.replace(TINY), tokens, true_lens, slots,
            {k: v for k, v in cache.items()})
        out_logits, out_cache = jax.jit(partial(
            engine_prefill_batch, cfg=cfg, mesh=mesh))(
                params, tokens=tokens, true_lens=true_lens, slots=slots,
                cache=cache)
        np.testing.assert_allclose(np.asarray(out_logits),
                                   np.asarray(ref_logits), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_cache["k"]),
                                   np.asarray(ref_cache["k"]), atol=1e-5)


class TestShardedArgmax:
    def test_matches_global_argmax(self):
        require_devices(8)
        from flash_attention_softmax_n_tpu.engine.engine import (
            _sharded_lm_head_argmax,
        )
        from flash_attention_softmax_n_tpu.quant.qtensor import (
            dequantize,
            quantize,
        )
        mesh = make_mesh({"data": 2, "model": 4})
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 64))
        lm = quantize(jax.random.normal(jax.random.PRNGKey(1), (64, 128)),
                      bits=8, axis=0)
        ref = jnp.argmax(x[:, 0] @ dequantize(lm), axis=-1)
        out = jax.jit(lambda x: _sharded_lm_head_argmax(x, lm, mesh))(x)
        np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(ref))


class TestTrainStep:
    def test_sharded_train_step_runs_and_reduces_loss(self):
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 4})
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)

        init, step = make_train_step(TINY, mesh, learning_rate=1e-2)
        params, opt_state = init(params)
        loss0 = None
        for i in range(3):
            params, opt_state, loss = step(params, opt_state, tokens)
            if loss0 is None:
                loss0 = float(loss)
        assert float(loss) < loss0

    def test_loss_matches_unsharded(self):
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 4})
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
        ref_loss = float(causal_lm_loss(params, TINY, tokens))

        init, step = make_train_step(TINY, mesh)
        sharded_params, opt_state = init(params)
        _, _, loss = step(sharded_params, opt_state, tokens)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)

    def test_pallas_attention_train_step_matches(self):
        # TP x DP training with the FUSED kernel: GSPMD can't partition a
        # pallas_call, so the train step shard_maps it over (data, model);
        # loss and descent must match the unsharded XLA forward
        require_devices(8)
        cfg = dataclasses.replace(TINY, attn_implementation="auto")
        mesh = make_mesh({"data": 2, "model": 4})
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
        ref_loss = float(causal_lm_loss(params, TINY, tokens))

        init, step = make_train_step(cfg, mesh, learning_rate=1e-2)
        sharded_params, opt_state = init(params)
        p1, o1, loss = step(sharded_params, opt_state, tokens)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
        _, _, loss2 = step(p1, o1, tokens)
        assert float(loss2) < float(loss)

    def test_sp_train_step_matches_unsharded(self):
        # TP x DP x SP: sequence sharded over 'sp', attention via ring —
        # the full combined-axes train step must reproduce the unsharded
        # loss and still descend
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 2, "sp": 2})
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
        ref_loss = float(causal_lm_loss(params, TINY, tokens))

        init, step = make_train_step(TINY, mesh, learning_rate=1e-2,
                                     sp_axis="sp")
        sharded_params, opt_state = init(params)
        p1, o1, loss = step(sharded_params, opt_state, tokens)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
        _, _, loss2 = step(p1, o1, tokens)
        assert float(loss2) < float(loss)

    def test_zero1_matches_replicated_and_shards_moments(self):
        # ZeRO-1: Adam moments shard over 'data' on top of TP — identical
        # update numerics (XLA reduce-scatters grads into the sharded
        # moments, all-gathers the updates), 1/dp the moment bytes per chip
        require_devices(8)
        mesh = make_mesh({"data": 4, "model": 2})
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)

        losses = {}
        for z in (False, True):
            params = init_decoder_params(TINY, jax.random.PRNGKey(0))
            init, step = make_train_step(TINY, mesh, learning_rate=1e-2,
                                         zero1=z)
            params, opt_state = init(params)
            ls = []
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state, tokens)
                ls.append(float(loss))
            losses[z] = ls
            if z:
                mu = opt_state[0].mu
                wq = mu["layers"]["wq"]
                assert "data" in tuple(wq.sharding.spec)  # DP-sharded
                shard = wq.addressable_shards[0].data
                assert shard.size == wq.size // 8  # 1/(dp*tp) per chip
                # step count stays a replicated scalar
                assert opt_state[0].count.sharding.spec == P()
        np.testing.assert_allclose(losses[False], losses[True], rtol=1e-5)

    def test_sp_axis_must_exist(self):
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 4})
        with pytest.raises(ValueError, match="no axis"):
            make_train_step(TINY, mesh, sp_axis="sp")

    def test_hybrid_dcn_train_step_matches_unsharded(self):
        # hybrid ICI x DCN layout: params replicated across 'dcn_data'
        # (pure DP over the slow links), batch sharded over both data axes
        require_devices(8)
        mesh = make_hybrid_mesh({"dcn_data": 2}, {"data": 2, "model": 2})
        params = init_decoder_params(TINY, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
        ref_loss = float(causal_lm_loss(params, TINY, tokens))

        init, step = make_train_step(TINY, mesh, learning_rate=1e-2,
                                     dcn_data_axis="dcn_data")
        sharded_params, opt_state = init(params)
        p1, o1, loss = step(sharded_params, opt_state, tokens)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
        _, _, loss2 = step(p1, o1, tokens)
        assert float(loss2) < float(loss)


class TestShardedServing:
    """parallel/serving.py: TP x DP continuous-batching decode.

    The sharded fused decode loop must generate token-identical output to
    the single-device loop (greedy), for dense and quantized caches — the
    cache write runs as a shard_map island (engine.py) and everything else
    is SPMD-partitioned.
    """

    def _setup(self, mode):
        from functools import partial

        from flash_attention_softmax_n_tpu.engine.engine import (
            engine_decode_loop,
        )

        cfg = dataclasses.replace(TINY, n_heads=8, n_kv_heads=4, d_model=64)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        B, S = 4, 64
        if mode is not None:
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                init_quantized_kv_cache,
            )
            cache = init_quantized_kv_cache(cfg.n_layers, B, cfg.n_kv_heads,
                                            S, cfg.head_dim, mode=mode)
            cache.pop("length")
        else:
            shape = (cfg.n_layers, B, cfg.n_kv_heads, S, cfg.head_dim)
            cache = {
                "k": 0.1 * jax.random.normal(jax.random.PRNGKey(1), shape),
                "v": 0.1 * jax.random.normal(jax.random.PRNGKey(2), shape),
            }
        cache["lengths"] = jnp.full((B,), 8, jnp.int32)
        tok = jnp.arange(B, dtype=jnp.int32) + 3
        active = jnp.ones((B,), bool)
        # num_steps=8 engages the tail-window (shard_map island) path
        ref, _, _ = jax.jit(partial(engine_decode_loop, cfg=cfg,
                                    num_steps=8))(
            params=params, tokens=tok, cache=dict(cache), active=active)
        return cfg, params, cache, tok, active, ref

    @pytest.mark.parametrize("mode", [None, "int8", "fp8"])
    def test_sharded_decode_matches_single_device(self, mode):
        require_devices(8)
        from flash_attention_softmax_n_tpu.parallel import (
            make_sharded_decode,
            shard_engine_state,
        )

        cfg, params, cache, tok, active, ref = self._setup(mode)
        mesh = make_mesh({"data": 2, "model": 4})
        sp, sc = shard_engine_state(params, dict(cache), mesh)
        loop = make_sharded_decode(cfg, mesh, num_steps=8, donate=False)
        out, cache2, active2 = loop(sp, tok, sc, active)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert "data" in str(out.sharding.spec)
        assert bool(jnp.all(cache2["lengths"] == cache["lengths"] + 8))

    def test_sharded_per_slot_sampling(self):
        # per-slot sampling variant: temp-0 rows of the sharded loop must
        # reproduce the greedy reference; sampled rows stay in range
        require_devices(8)
        from flash_attention_softmax_n_tpu.parallel import (
            make_sharded_decode,
            shard_engine_state,
        )

        cfg, params, cache, tok, active, ref = self._setup(None)
        mesh = make_mesh({"data": 2, "model": 4})
        sp_, sc = shard_engine_state(params, dict(cache), mesh)
        loop = make_sharded_decode(cfg, mesh, num_steps=8, donate=False,
                                   per_slot_sampling=True)
        temps = jnp.asarray([0.0, 1.5, 0.0, 2.0], jnp.float32)
        ks = jnp.asarray([0, 8, 0, 0], jnp.int32)
        ps = jnp.asarray([1.0, 1.0, 1.0, 0.9], jnp.float32)
        out, _, _ = loop(sp_, tok, sc, active, jax.random.PRNGKey(3),
                         temps, ks, ps)
        out = np.asarray(out)
        np.testing.assert_array_equal(out[0], np.asarray(ref)[0])
        np.testing.assert_array_equal(out[2], np.asarray(ref)[2])
        assert out.min() >= 0 and out.max() < cfg.vocab_size


class TestRemat:
    """cfg.remat wraps each scanned layer in jax.checkpoint: identical
    loss and gradients, O(1) activation memory in depth."""

    def test_remat_grads_match(self):
        from flash_attention_softmax_n_tpu.parallel import causal_lm_loss

        cfg = dataclasses.replace(TINY, remat=False)
        cfg_r = dataclasses.replace(TINY, remat=True)
        from flash_attention_softmax_n_tpu.models import init_decoder_params
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0,
                                  cfg.vocab_size)
        l0, g0 = jax.value_and_grad(causal_lm_loss)(params, cfg, toks)
        l1, g1 = jax.value_and_grad(causal_lm_loss)(params, cfg_r, toks)
        assert abs(float(l0) - float(l1)) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestMeshedInferenceEngine:
    """InferenceEngine(mesh=...): the full host serving loop (batched
    admission + fused chunks) runs TP x DP and must be token-identical to
    the single-device engine."""

    def test_engine_on_mesh_matches_single_device(self):
        require_devices(8)
        from flash_attention_softmax_n_tpu.engine import InferenceEngine
        from flash_attention_softmax_n_tpu.models import init_decoder_params

        cfg = dataclasses.replace(TINY, n_heads=8, n_kv_heads=4)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8], [2, 7]]

        def run(mesh):
            eng = InferenceEngine(cfg, params, max_batch=4, max_len=64,
                                  mesh=mesh)
            for j, p in enumerate(prompts):
                eng.submit(p, max_new_tokens=6 + j)
            done = eng.run_until_done(loop_steps=8)
            return {r.request_id: r.output for r in done}

        ref = run(None)
        out = run(make_mesh({"data": 2, "model": 4}))
        assert out == ref

    def test_engine_on_mesh_fused_argmax_matches(self):
        # int8 lm_head + divisible vocab: the meshed fused loop samples
        # via the cross-shard argmax merge (_sharded_lm_head_argmax) and
        # must be token-identical to the single-device fused argmax
        require_devices(8)
        from flash_attention_softmax_n_tpu.engine import InferenceEngine
        from flash_attention_softmax_n_tpu.engine.engine import (
            _greedy_fusable,
        )
        from flash_attention_softmax_n_tpu.models import init_decoder_params
        from flash_attention_softmax_n_tpu.quant import (
            quantize_decoder_weights,
        )

        cfg = dataclasses.replace(TINY, vocab_size=96, n_heads=8,
                                  n_kv_heads=4)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        qparams = quantize_decoder_weights(params, bits=8)
        mesh = make_mesh({"data": 2, "model": 4})
        assert _greedy_fusable(qparams, cfg, mesh, 4)
        prompts = [[3, 1, 4, 1], [9, 2], [5, 3, 5], [2, 7, 1, 8]]

        def run(mesh_):
            eng = InferenceEngine(cfg, qparams, max_batch=4, max_len=64,
                                  mesh=mesh_)
            for p in prompts:
                eng.submit(p, max_new_tokens=6)
            done = eng.run_until_done(loop_steps=8)
            return {r.request_id: r.output for r in done}

        ref = run(None)
        out = run(mesh)
        assert out == ref

    def test_engine_on_mesh_chunked_prefill_matches(self):
        # long prompts through the chunked lane under TP x DP: the
        # continuation prefill gathers data-sharded cache prefixes (nb=1
        # forces the auto dispatch to the GSPMD XLA path)
        require_devices(8)
        from flash_attention_softmax_n_tpu.engine import InferenceEngine
        from flash_attention_softmax_n_tpu.models import init_decoder_params

        cfg = dataclasses.replace(TINY, n_heads=8, n_kv_heads=4)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.RandomState(2)
        prompts = [rng.randint(0, 97, size=n).tolist() for n in (40, 20)]

        def run(mesh_):
            eng = InferenceEngine(cfg, params, max_batch=2, max_len=64,
                                  mesh=mesh_, prefill_chunk=16)
            for p in prompts:
                eng.submit(p, max_new_tokens=5)
            done = eng.run_until_done(loop_steps=8)
            return {r.request_id: r.output for r in done}

        ref = run(None)
        out = run(make_mesh({"data": 2, "model": 4}))
        assert out == ref

    def test_engine_on_mesh_pallas_prefill_matches(self):
        # same invariant with the auto (Pallas, interpreted on CPU)
        # attention: the meshed prefill runs the shard_mapped kernel
        # instead of the XLA fallback and must still be token-identical
        require_devices(8)
        from flash_attention_softmax_n_tpu.engine import InferenceEngine
        from flash_attention_softmax_n_tpu.models import init_decoder_params

        cfg = dataclasses.replace(TINY, n_heads=8, n_kv_heads=4,
                                  attn_implementation="auto")
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

        def run(mesh):
            eng = InferenceEngine(cfg, params, max_batch=2, max_len=64,
                                  mesh=mesh)
            for j, p in enumerate(prompts):
                eng.submit(p, max_new_tokens=5 + j)
            done = eng.run_until_done(loop_steps=8)
            return {r.request_id: r.output for r in done}

        ref = run(None)
        out = run(make_mesh({"data": 2, "model": 4}))
        assert out == ref


class TestRingAttentionPallasImpl:
    """Ring per-block compute on the flash kernel (round-2 VERDICT item 6):
    forward folds the kernel's (o, lse) partials, backward runs the flash
    backward kernels against the global lse
    (kernels/flash_attention.flash_attention_block_grads) — per-device
    memory stays O(block); no (B, H, Lq, Lk) scores. On CPU the kernel runs
    in interpret mode; numerics are identical."""

    @pytest.mark.parametrize("n", [0.0, 1.0])
    @pytest.mark.parametrize("is_causal", [False, True])
    def test_matches_oracle(self, n, is_causal):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, l, e = 1, 2, 64, 32
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks)
        out = jax.jit(lambda q, k, v: ring_attention_n(
            q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=n,
            is_causal=is_causal, implementation="pallas"))(q, k, v)
        expected = slow_attention_n(q, k, v, softmax_n_param=n,
                                    is_causal=is_causal)
        np.testing.assert_allclose(out, expected, atol=2e-4,
                                   err_msg=f"n={n} causal={is_causal}")

    @pytest.mark.parametrize("n", [0.0, 1.0])
    def test_grads_match_oracle(self, n):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, l, e = 1, 2, 32, 16
        ks = jax.random.split(jax.random.PRNGKey(8), 4)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks[:3])
        ct = jax.random.normal(ks[3], (b, h, l, e))

        def ring_loss(q, k, v):
            out = ring_attention_n(q, k, v, mesh=mesh, axis_name="sp",
                                   softmax_n_param=n, is_causal=True,
                                   implementation="pallas")
            return jnp.sum(out * ct)

        def oracle_loss(q, k, v):
            return jnp.sum(slow_attention_n(q, k, v, softmax_n_param=n,
                                            is_causal=True) * ct)

        got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
        want = jax.grad(oracle_loss, argnums=(0, 1, 2))(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(g, w, atol=2e-4,
                                       err_msg=f"d{name} n={n}")

    def test_gqa_grads(self):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, kvh, l, e = 1, 4, 2, 32, 16
        ks = jax.random.split(jax.random.PRNGKey(9), 4)
        q = 0.5 * jax.random.normal(ks[0], (b, h, l, e))
        k = 0.5 * jax.random.normal(ks[1], (b, kvh, l, e))
        v = 0.5 * jax.random.normal(ks[2], (b, kvh, l, e))
        ct = jax.random.normal(ks[3], (b, h, l, e))
        rep = lambda x: jnp.repeat(x, h // kvh, axis=1)

        def ring_loss(q, k, v):
            out = ring_attention_n(q, k, v, mesh=mesh, axis_name="sp",
                                   softmax_n_param=1.0, is_causal=True,
                                   implementation="pallas")
            return jnp.sum(out * ct), out

        def oracle_loss(q, k, v):
            out = slow_attention_n(q, rep(k), rep(v), softmax_n_param=1.0,
                                   is_causal=True)
            return jnp.sum(out * ct), out

        (_, out), got = jax.jit(jax.value_and_grad(
            ring_loss, argnums=(0, 1, 2), has_aux=True))(q, k, v)
        (_, want_out), want = jax.value_and_grad(
            oracle_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        np.testing.assert_allclose(out, want_out, atol=2e-4)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(g, w, atol=2e-4,
                                       err_msg=f"d{name} (gqa pallas)")

    def test_unknown_implementation_raises(self):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        x = jnp.zeros((1, 1, 8, 8))
        with pytest.raises(ValueError, match="unknown implementation"):
            ring_attention_n(x, x, x, mesh=mesh, axis_name="sp",
                             implementation="fast")

    def test_pallas_requires_matching_ev(self):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        q = jnp.zeros((1, 1, 8, 16))
        v = jnp.zeros((1, 1, 8, 8))
        with pytest.raises(ValueError, match="E == Ev"):
            ring_attention_n(q, q, v, mesh=mesh, axis_name="sp",
                             implementation="pallas")


class TestFineTuneTrainStep:
    """make_train_step with dropout_rng (round-3): the surgery -> fine-tune
    loop the reference runs through composer (its patched modules keep
    nn.Dropout live, surgery/_bert.py:102) on the TP x DP mesh."""

    def test_dropout_step_updates_and_is_deterministic(self):
        require_devices(8)
        import dataclasses
        from flash_attention_softmax_n_tpu.parallel import make_train_step
        cfg = dataclasses.replace(TINY, attn_dropout=0.2)
        mesh = make_mesh({"data": 2, "model": 4})
        init, step = make_train_step(cfg, mesh, learning_rate=1e-3)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        params, opt_state = init(params)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)

        key = jax.random.PRNGKey(7)
        _, _, l1 = step(params, opt_state, tokens, dropout_rng=key)
        _, _, l2 = step(params, opt_state, tokens, dropout_rng=key)
        _, _, l3 = step(params, opt_state, tokens,
                        dropout_rng=jax.random.PRNGKey(8))
        _, _, l_eval = step(params, opt_state, tokens)
        assert float(l1) == pytest.approx(float(l2))
        assert float(l1) != pytest.approx(float(l_eval))
        assert float(l1) != pytest.approx(float(l3))

        # params actually move and stay sharded
        new_params, _, _ = step(params, opt_state, tokens, dropout_rng=key)
        moved = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)), params, new_params)
        assert any(jax.tree_util.tree_leaves(moved))


class TestRingPaddingStory:
    def test_causal_right_padding_needs_no_mask(self):
        # the ring's documented mask story (r4): with causal attention,
        # right-padded KEY positions are never attended by real queries,
        # so real rows of the padded problem equal the unpadded problem
        # exactly — the loss mask is the only mask training needs
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        b, h, e, true_len, L = 1, 2, 32, 40, 64
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, L, e)) for kk in ks)
        # poison the padding tail to prove it can't leak in
        k = k.at[:, :, true_len:].set(1e9)
        v = v.at[:, :, true_len:].set(-1e9)
        out = jax.jit(lambda q, k, v: ring_attention_n(
            q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=1.0,
            is_causal=True))(q, k, v)
        crop = jax.jit(lambda q, k, v: ring_attention_n(
            q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=1.0,
            is_causal=True))(q[:, :, :true_len], k[:, :, :true_len],
                             v[:, :, :true_len])
        np.testing.assert_allclose(out[:, :, :true_len], crop, atol=1e-5)

    def test_attn_mask_rejected_with_guidance(self):
        require_devices(4)
        mesh = make_mesh({"sp": 4})
        q = jnp.zeros((1, 2, 16, 32))
        with pytest.raises(NotImplementedError, match="LOSS"):
            ring_attention_n(q, q, q, mesh=mesh, axis_name="sp",
                             attn_mask=jnp.ones((1, 1, 16, 16), bool))


class TestRingCombinedMeshPallas:
    def test_ring_pallas_under_tp_dp_sp_mesh(self):
        # r4 fix: a pallas_call cannot sit under ANY GSPMD-partitioned
        # axis — the ring's shard_map must take data/model manual too
        # (hit by the combined TP x DP x SP train step on real TPU)
        require_devices(8)
        mesh = make_mesh({"data": 2, "model": 2, "sp": 2})
        b, h, l, e = 2, 4, 32, 32
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q, k, v = (0.5 * jax.random.normal(kk, (b, h, l, e)) for kk in ks)
        out = jax.jit(lambda q, k, v: ring_attention_n(
            q, k, v, mesh=mesh, axis_name="sp", softmax_n_param=1.0,
            is_causal=True, implementation="pallas"))(q, k, v)
        expected = slow_attention_n(q, k, v, softmax_n_param=1.0,
                                    is_causal=True)
        np.testing.assert_allclose(out, expected, atol=2e-4)

    def test_sp_train_step_pallas(self):
        # the failing configuration end-to-end: make_train_step with an
        # sp axis and the pallas ring implementation forced via config
        require_devices(8)
        import dataclasses

        from flash_attention_softmax_n_tpu.models import (
            DecoderConfig,
            init_decoder_params,
        )
        from flash_attention_softmax_n_tpu.parallel import make_train_step

        cfg = DecoderConfig(
            vocab_size=97, d_model=64, n_layers=2, n_heads=4, n_kv_heads=4,
            d_ff=128, max_seq_len=64, softmax_n=1.0, dtype=jnp.float32,
            attn_implementation="pallas", remat=True)
        mesh = make_mesh({"data": 2, "model": 2, "sp": 2})
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0,
                                    cfg.vocab_size)
        init, step = make_train_step(cfg, mesh, learning_rate=1e-3,
                                     sp_axis="sp")
        p, o = init(params)
        _, _, loss = step(p, o, tokens)
        assert bool(jnp.isfinite(loss))
