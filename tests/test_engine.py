"""Continuous-batching engine tests.

Correctness anchor: the engine's slot-based prefill+decode must reproduce the
standalone ``greedy_generate`` path token-for-token for every request,
regardless of arrival order, slot assignment, or co-residency with other
requests in the batch — the defining invariant of continuous batching.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu.engine import InferenceEngine
from flash_attention_softmax_n_tpu.models import (
    DecoderConfig,
    greedy_generate,
    init_decoder_params,
)

TINY = DecoderConfig(
    vocab_size=97, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
    d_ff=64, max_seq_len=128, softmax_n=1.0, dtype=jnp.float32,
    attn_implementation="xla",
)


@pytest.fixture(scope="module")
def params():
    return init_decoder_params(TINY, jax.random.PRNGKey(0))


def reference_tokens(params, prompt, n_new):
    out = greedy_generate(params, TINY, jnp.asarray([prompt], jnp.int32), n_new)
    return [int(t) for t in out[0]]


class TestEngine:
    def test_single_request_matches_greedy(self, params):
        prompt = [3, 14, 15, 92, 65]
        expected = reference_tokens(params, prompt, 8)
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64)
        eng.submit(prompt, max_new_tokens=8)
        done = eng.run_until_done()
        assert len(done) == 1
        assert done[0].output == expected

    def test_concurrent_requests_match_independent_runs(self, params):
        prompts = [[1, 2, 3], [10, 20, 30, 40, 50, 60], [7], [80, 81]]
        expected = {tuple(p): reference_tokens(params, p, 6) for p in prompts}
        eng = InferenceEngine(TINY, params, max_batch=4, max_len=64)
        ids = {eng.submit(p, max_new_tokens=6): tuple(p) for p in prompts}
        done = eng.run_until_done()
        assert len(done) == 4
        for req in done:
            assert req.output == expected[ids[req.request_id]], \
                f"request {ids[req.request_id]} diverged"

    def test_staggered_arrivals(self, params):
        # second request arrives mid-decode of the first; both must match
        p1, p2 = [5, 6, 7, 8], [42, 43]
        e1 = reference_tokens(params, p1, 10)
        e2 = reference_tokens(params, p2, 5)
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64)
        eng.submit(p1, max_new_tokens=10)
        for _ in range(4):
            eng.step()
        eng.submit(p2, max_new_tokens=5)
        done = eng.run_until_done()
        by_id = sorted(done, key=lambda r: r.request_id)
        assert by_id[0].output == e1
        assert by_id[1].output == e2

    def test_admission_preserves_bucket_fifo(self, params):
        # _admit partitions the queue by prompt bucket (cross-bucket
        # reorder is allowed) but must keep FIFO within a bucket and keep
        # un-admitted requests queued in original order
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64)
        # bucket 32: a & c; bucket 64: b; only 2 slots -> a,c admitted
        # first (same bucket groups), b stays queued
        a = eng.submit([1] * 10, max_new_tokens=2)
        b = eng.submit([2] * 40, max_new_tokens=2)
        c = eng.submit([3] * 12, max_new_tokens=2)
        eng._admit()
        in_slots = {r.request_id for r in eng.slots if r is not None}
        assert in_slots == {a, c}
        assert [r.request_id for r in eng.queue] == [b]
        done = eng.run_until_done()
        assert {r.request_id for r in done} == {a, b, c}

    def test_more_requests_than_slots(self, params):
        # queueing: 5 requests through 2 slots
        prompts = [[i + 1, i + 2] for i in range(5)]
        expected = [reference_tokens(params, p, 4) for p in prompts]
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64)
        for p in prompts:
            eng.submit(p, max_new_tokens=4)
        done = eng.run_until_done()
        assert len(done) == 5
        outs = {r.request_id: r.output for r in done}
        for rid, exp in enumerate(expected):
            assert outs[rid] == exp

    def test_eos_termination(self, params):
        prompt = [3, 14, 15]
        full = reference_tokens(params, prompt, 10)
        eos = full[3]  # terminate when the 4th generated token appears
        eng = InferenceEngine(TINY, params, max_batch=1, max_len=64)
        eng.submit(prompt, max_new_tokens=10, eos_token=eos)
        done = eng.run_until_done()
        assert done[0].output == full[:4]
        assert done[0].done

    @pytest.mark.parametrize("mode", ["int8", "fp8"])
    def test_quantized_cache_engine(self, params, mode):
        prompt = [3, 14, 15, 92]
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64,
                              kv_quantization=mode)
        eng.submit(prompt, max_new_tokens=6)
        done = eng.run_until_done()
        assert len(done) == 1 and len(done[0].output) == 6
        # quantized decode should track the dense greedy path closely
        # (identical for the first token, minor drift later is acceptable)
        expected = reference_tokens(params, prompt, 6)
        assert done[0].output[0] == expected[0]

    def test_temperature_sampling_varies(self, params):
        prompt = [3, 14, 15]
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64)
        eng.submit(prompt, max_new_tokens=12, temperature=5.0)
        eng.submit(prompt, max_new_tokens=12, temperature=5.0)
        done = eng.run_until_done()
        assert done[0].output != done[1].output  # with very high probability

    def test_chunked_prefill_matches_monolithic(self, params):
        # prompts longer than prefill_chunk admit via bounded continuation
        # prefills (engine_prefill_chunk) — token-identical to the
        # monolithic-prefill engine
        rng = np.random.RandomState(0)
        prompts = [rng.randint(0, 97, size=n).tolist() for n in (40, 33, 17)]
        expected = [reference_tokens(params, p, 6) for p in prompts]

        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128,
                              prefill_chunk=16)
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        done = eng.run_until_done(loop_steps=8)
        outs = {r.request_id: r.output for r in done}
        assert [outs[i] for i in range(3)] == expected
        # chunked requests really took the chunked lane
        assert set(eng._prefill_chunks) >= {0, 16, 32}

    @pytest.mark.parametrize("mode", ["int8", "fp8"])
    def test_chunked_prefill_quantized_cache(self, params, mode):
        rng = np.random.RandomState(1)
        prompt = rng.randint(0, 97, size=37).tolist()
        ref = InferenceEngine(TINY, params, max_batch=1, max_len=128,
                              kv_quantization=mode)
        ref.submit(prompt, max_new_tokens=6)
        want = ref.run_until_done()[0].output

        eng = InferenceEngine(TINY, params, max_batch=1, max_len=128,
                              kv_quantization=mode, prefill_chunk=16)
        eng.submit(prompt, max_new_tokens=6)
        got = eng.run_until_done()[0].output
        # first token comes from bf16 attention over the dequantized
        # prefix (strictly more accurate than monolithic quantize-then-
        # read) — allow near-tie drift after it
        assert got[0] == want[0]
        assert len(got) == len(want)

    def test_long_prompt_at_queue_head_admits_first(self, params):
        # anti-starvation: with one contested slot, a long prompt at the
        # queue head must admit before younger short prompts
        rng = np.random.RandomState(3)
        long_p = rng.randint(0, 97, size=40).tolist()
        eng = InferenceEngine(TINY, params, max_batch=1, max_len=128,
                              prefill_chunk=16)
        eng.submit(long_p, max_new_tokens=4)          # rid 0 (long, head)
        eng.submit([1, 2, 3], max_new_tokens=4)       # rid 1 (short)
        done = eng.run_until_done(loop_steps=8)
        finish_order = [r.request_id for r in done]
        assert finish_order == [0, 1]

    def test_overlong_request_rejected(self, params):
        eng = InferenceEngine(TINY, params, max_batch=1, max_len=16)
        with pytest.raises(ValueError):
            eng.submit(list(range(10)), max_new_tokens=10)


class TestDecodeLoop:
    """engine_decode_loop: the fused multi-step serving path.

    num_steps >= 8 engages the tail-window mode (shared-index ring buffer +
    one flush); it must be token-identical to per-step engine_decode for
    dense caches and agree for quantized ones (within-window keys are
    attended in bf16 — strictly more accurate than the per-step
    quantize-then-read path, so token streams can only differ where the
    quantization error itself flips a near-tie).
    """

    def _prefill(self, params, cache, prompts):
        from functools import partial

        from flash_attention_softmax_n_tpu.engine.engine import engine_prefill

        pre = jax.jit(partial(engine_prefill, cfg=TINY))
        for slot, p in enumerate(prompts):
            toks = jnp.asarray([p], jnp.int32)
            _, cache = pre(params=params, tokens=toks,
                           true_len=jnp.asarray(len(p), jnp.int32),
                           slot=jnp.asarray(slot, jnp.int32), cache=cache)
        return cache

    def _mk_cache(self, quantized, batch=4, max_len=64):
        if quantized:
            from flash_attention_softmax_n_tpu.quant.kv_cache import (
                init_quantized_kv_cache,
            )
            cache = init_quantized_kv_cache(TINY.n_layers, batch,
                                            TINY.n_kv_heads, max_len,
                                            TINY.head_dim, mode="int8")
            cache.pop("length")
        else:
            shape = (TINY.n_layers, batch, TINY.n_kv_heads, max_len,
                     TINY.head_dim)
            cache = {"k": jnp.zeros(shape, TINY.dtype),
                     "v": jnp.zeros(shape, TINY.dtype)}
        cache["lengths"] = jnp.zeros((batch,), jnp.int32)
        return cache

    @pytest.mark.parametrize("quantized", [False, True])
    def test_tail_loop_matches_per_step(self, params, quantized):
        from functools import partial

        from flash_attention_softmax_n_tpu.engine.engine import (
            engine_decode,
            engine_decode_loop,
        )

        steps = 12  # >= 8 -> tail mode
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7, 9],
                   [2, 7, 1]]
        cache = self._prefill(params, self._mk_cache(quantized), prompts)
        tok0 = jnp.asarray([11, 12, 13, 14], jnp.int32)
        active = jnp.ones((4,), bool)

        dec = jax.jit(partial(engine_decode, cfg=TINY))
        c1, cur, seq = dict(cache), tok0, []
        for _ in range(steps):
            lg, c1 = dec(params=params, tokens=cur, cache=c1, active=active)
            cur = jnp.argmax(lg, -1).astype(jnp.int32)
            seq.append(cur)
        seq = jnp.stack(seq, 1)

        loop = jax.jit(partial(engine_decode_loop, cfg=TINY,
                               num_steps=steps))
        toks, c2, _ = loop(params=params, tokens=tok0, cache=dict(cache),
                           active=active)

        np.testing.assert_array_equal(np.asarray(c1["lengths"]),
                                      np.asarray(c2["lengths"]))
        if quantized:
            # bf16 window vs int8 round-trip: allow rare near-tie flips
            agree = float(jnp.mean((toks == seq).astype(jnp.float32)))
            assert agree >= 0.9, f"token agreement {agree}"
            d1 = c1["k"].values.astype(jnp.float32) * c1["k"].scales
            d2 = c2["k"].values.astype(jnp.float32) * c2["k"].scales
            # prefix (prefilled) region must be untouched and identical
            np.testing.assert_allclose(np.asarray(d1[:, :, :, :3]),
                                       np.asarray(d2[:, :, :, :3]))
        else:
            np.testing.assert_array_equal(np.asarray(toks), np.asarray(seq))
            np.testing.assert_allclose(np.asarray(c1["k"]),
                                       np.asarray(c2["k"]), atol=1e-5)

    @pytest.mark.parametrize("quantized", [False, True])
    def test_attn_window_matches_full(self, params, quantized):
        # attn_len slices the main-cache attention span to a host-known
        # bound; with attn_len >= max(active lengths) it must be
        # token-identical to the full-cache loop (the masked rows it skips
        # contribute nothing)
        from functools import partial

        from flash_attention_softmax_n_tpu.engine.engine import (
            engine_decode_loop,
        )

        prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7, 9],
                   [2, 7, 1]]
        cache = self._prefill(params, self._mk_cache(quantized, max_len=64),
                              prompts)
        tok0 = jnp.asarray([11, 12, 13, 14], jnp.int32)
        active = jnp.ones((4,), bool)

        full = jax.jit(partial(engine_decode_loop, cfg=TINY, num_steps=12))
        toks_f, cf, _ = full(params=params, tokens=tok0, cache=dict(cache),
                             active=active)
        win = jax.jit(partial(engine_decode_loop, cfg=TINY, num_steps=12,
                              attn_len=16))
        toks_w, cw, _ = win(params=params, tokens=tok0, cache=dict(cache),
                            active=active)
        np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_w))
        kf = cf["k"].values if quantized else cf["k"]
        kw = cw["k"].values if quantized else cw["k"]
        assert kf.shape == kw.shape  # flush goes through the FULL cache
        # the window changes the attention reduction tree, so written rows
        # agree only to rounding (masked rows contribute exactly zero)
        np.testing.assert_allclose(np.asarray(kf, np.float32),
                                   np.asarray(kw, np.float32), atol=1e-5)

    def test_eos_deactivation_in_tail_mode(self, params):
        from functools import partial

        from flash_attention_softmax_n_tpu.engine.engine import (
            engine_decode_loop,
        )

        cache = self._prefill(params, self._mk_cache(False),
                              [[3, 1, 4], [9, 2, 6, 5], [5, 3], [2, 7, 1]])
        tok0 = jnp.asarray([11, 12, 13, 14], jnp.int32)
        active = jnp.ones((4,), bool)
        loop = jax.jit(partial(engine_decode_loop, cfg=TINY, num_steps=10))
        toks, cache, _ = loop(params=params, tokens=tok0, cache=dict(cache),
                              active=active)
        eos = int(toks[0, 2])  # force slot 0 to hit EOS at its 3rd token
        loop2 = jax.jit(partial(engine_decode_loop, cfg=TINY, num_steps=10,
                                eos_token=eos))
        cache2 = self._prefill(params, self._mk_cache(False),
                               [[3, 1, 4], [9, 2, 6, 5], [5, 3], [2, 7, 1]])
        base = dict(cache2)["lengths"]
        toks2, cache2, active2 = loop2(params=params, tokens=tok0,
                                       cache=dict(cache2), active=active)
        # slot 0 deactivates after emitting eos; its length stops advancing
        assert not bool(active2[0])
        assert int(cache2["lengths"][0]) == int(base[0]) + 3
        # deactivated slots keep emitting their last token
        assert all(int(t) == eos for t in np.asarray(toks2[0, 2:]))


class TestLoopServing:
    """Host-engine fast path: run_until_done(loop_steps=N) must reproduce
    the per-step engine token-for-token for greedy requests (chunked fused
    decode + batched admission are pure scheduling changes)."""

    def _run(self, params, loop_steps):
        eng = InferenceEngine(TINY, params, max_batch=3, max_len=128)
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8], [2, 7],
                   [8, 8, 1, 2, 3, 4]]
        for j, p in enumerate(prompts):
            eng.submit(p, max_new_tokens=7 + j,
                       eos_token=0 if j == 2 else None)
        done = (eng.run_until_done(loop_steps=loop_steps)
                if loop_steps else eng.run_until_done())
        return {r.request_id: r.output for r in done}

    def test_loop_serving_matches_stepwise(self, params):
        ref = self._run(params, None)
        out = self._run(params, 8)
        assert set(out) == set(ref)
        for rid in ref:
            assert out[rid] == ref[rid], f"request {rid} diverged"

    def test_mixed_temperature_stays_fused(self, params, monkeypatch):
        # mixed greedy/sampling batches are (B,) data, not structure: the
        # fused loop must handle them without falling back to per-step
        # decode — forbid step() outright
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        monkeypatch.setattr(
            eng, "step",
            lambda *a, **k: pytest.fail("fell back to per-step decode"))
        eng.submit([3, 1, 4], max_new_tokens=6)
        eng.submit([9, 2], max_new_tokens=6, temperature=0.8)
        done = eng.run_until_done(loop_steps=8)
        assert len(done) == 2 and all(len(r.output) == 6 for r in done)
        # the greedy row must be token-exact vs the reference
        greedy = next(r for r in done if r.temperature == 0.0)
        assert greedy.output == reference_tokens(params, [3, 1, 4], 6)

    def test_top_k_one_sampling_is_greedy_on_loop(self, params, monkeypatch):
        # top_k=1 at any temperature is the greedy fixed point — a
        # deterministic end-to-end check of the filtered path in the
        # fused loop (and that k/p requests stay fused too)
        prompt = [3, 14, 15]
        expected = reference_tokens(params, prompt, 8)
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        monkeypatch.setattr(
            eng, "step",
            lambda *a, **k: pytest.fail("fell back to per-step decode"))
        eng.submit(prompt, max_new_tokens=8, temperature=2.0, top_k=1)
        eng.submit(prompt, max_new_tokens=8, temperature=1.5, top_p=1e-6)
        done = eng.run_until_done(loop_steps=8)
        assert all(r.output == expected for r in done)

    def test_first_token_eos_with_loop(self, params):
        # a request finishing on its FIRST token is freed by admission
        # bookkeeping AFTER the decode chunk already dispatched with its
        # slot active — the chunk's tokens for that slot must be discarded
        prompt = [3, 14, 15]
        first = reference_tokens(params, prompt, 1)[0]
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        eng.submit(prompt, max_new_tokens=10, eos_token=first)
        eng.submit([9, 2, 6], max_new_tokens=6)
        done = eng.run_until_done(loop_steps=8)
        outs = {r.request_id: r for r in done}
        assert outs[0].output == [first] and outs[0].done
        assert outs[1].output == reference_tokens(params, [9, 2, 6], 6)

    def test_one_token_budget_with_loop(self, params):
        prompt = [5, 3, 5]
        expected = reference_tokens(params, prompt, 1)
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        eng.submit(prompt, max_new_tokens=1)
        eng.submit(prompt, max_new_tokens=5)
        done = eng.run_until_done(loop_steps=8)
        outs = {r.request_id: r.output for r in done}
        assert outs[0] == expected
        assert outs[1] == reference_tokens(params, prompt, 5)

    def test_profile_report_accounts_loop_phases(self, params):
        # the churn bench's phase breakdown: every scheduling phase of the
        # fused loop is counted, totals are positive wall-clock, and
        # reset=True clears the accumulators
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        for j in range(3):
            eng.submit([3 + j, 1, 4], max_new_tokens=10)
        eng.run_until_done(loop_steps=8)
        rep = eng.profile_report()
        assert {"admit_dispatch", "chunk_plan", "chunk_dispatch",
                "chunk_sync", "admit_sync"} <= set(rep)
        for phase, row in rep.items():
            assert row["count"] >= 1, phase
            assert row["total_s"] >= 0.0
            assert row["mean_ms"] == pytest.approx(
                row["total_s"] / row["count"] * 1e3)
        assert eng.profile_report() == {}  # reset cleared it
        # the per-step path must not grow phase counters
        eng.submit([9, 2], max_new_tokens=3)
        eng.run_until_done()
        assert eng.profile_report() == {}

    def test_max_steps_bounds_work(self, params):
        # the public contract: run_until_done(max_steps=N) terminates
        # after at most N accounting units (chunks count their full
        # length) even with work left over
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        for j in range(4):
            eng.submit([3 + j, 1, 4], max_new_tokens=50)
        done = eng.run_until_done(max_steps=16, loop_steps=8)
        # 2 slots x 16 steps of budget can't finish 4 x 50-token requests
        assert len(done) < 4
        emitted = sum(len(r.output) for r in done) + sum(
            len(r.output) for r in eng.slots if r is not None)
        # at most max_steps tokens per slot could have been decoded (+1
        # prefill token per admitted request)
        assert emitted <= 16 * 2 + 4
        # the queue/slots still hold the unfinished work
        assert eng.queue or any(s is not None for s in eng.slots)

    def test_randomized_scheduling_stress(self, params):
        # fixed-seed fuzz over the whole scheduler: mixed prompt lengths
        # (bucket + chunked lanes), budgets, EOS, re-admission through a
        # small slot pool, budget-adaptive chunks — every greedy request
        # must match its independent greedy reference exactly
        rng = np.random.RandomState(7)
        reqs = []
        for _ in range(12):
            plen = int(rng.choice([3, 9, 20, 40, 70]))
            budget = int(rng.randint(1, 12))
            prompt = rng.randint(0, 97, size=plen).tolist()
            reqs.append((prompt, budget))
        expected = {}
        eng = InferenceEngine(TINY, params, max_batch=3, max_len=128,
                              prefill_chunk=32)
        for rid, (prompt, budget) in enumerate(reqs):
            full = reference_tokens(params, prompt, budget)
            eos = full[budget // 2] if budget >= 4 and rid % 3 == 0 else None
            if eos is not None:
                cut = full.index(eos) + 1
                expected[rid] = full[:cut]
            else:
                expected[rid] = full
            eng.submit(prompt, max_new_tokens=budget, eos_token=eos)
        done = eng.run_until_done(loop_steps=16)
        assert len(done) == len(reqs)
        for r in done:
            assert r.output == expected[r.request_id], (
                f"request {r.request_id} diverged")

    def test_nucleus_sampling_varies_on_loop(self, params):
        # two identical nucleus requests should diverge (high temperature,
        # wide p) while staying inside the truncated support
        prompt = [3, 14, 15]
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128)
        eng.submit(prompt, max_new_tokens=16, temperature=5.0, top_p=0.95)
        eng.submit(prompt, max_new_tokens=16, temperature=5.0, top_p=0.95)
        done = eng.run_until_done(loop_steps=8)
        assert len(done) == 2
        assert done[0].output != done[1].output  # w.h.p.

    def test_piggyback_parity_and_edges(self, params):
        # piggybacked admission (prompts prefilled INSIDE the decode
        # chunk) must be output-identical to classic admission, across
        # mixed budgets, eos-on-first-token, and budget-1 requests
        def run(piggy):
            rng = np.random.RandomState(3)
            eng = InferenceEngine(TINY, params, max_batch=8, max_len=128,
                                  piggyback_prefill=piggy)
            for j in range(20):
                plen = int(rng.randint(1, 60))
                budget = 1 if j % 7 == 0 else int(rng.randint(2, 20))
                eng.submit(
                    rng.randint(0, TINY.vocab_size, size=plen).tolist(),
                    max_new_tokens=budget, eos_token=5)
            done = eng.run_until_done(loop_steps=16)
            assert len(done) == 20
            return ({r.request_id: r.output for r in done},
                    eng.counters_report())

        with_piggy, rep = run(True)
        assert rep.get("piggyback_prompts", 0) > 0, (
            "workload never piggybacked — the test lost its subject")
        without_piggy, _ = run(False)
        assert with_piggy == without_piggy


class TestPrewarm:
    def test_prewarm_counts_and_parity(self, params):
        # prewarm AOT-compiles the greedy (chunk x attn_len x piggy)
        # variant grid without executing anything (donated cache must be
        # untouched), and a prewarmed engine serves identical tokens
        eng = InferenceEngine(TINY, params, max_batch=4, max_len=128)
        n = eng.prewarm(loop_steps=16)
        # chunks {8, 16} x attn_len bucket {128} x {plain, piggy} = 4
        assert n == 4
        prompts = [[1, 2, 3], [10, 20, 30, 40], [7]]
        expected = {tuple(p): reference_tokens(params, p, 6)
                    for p in prompts}
        ids = {eng.submit(p, max_new_tokens=6): tuple(p) for p in prompts}
        done = eng.run_until_done(loop_steps=16)
        assert len(done) == 3
        for req in done:
            assert req.output == expected[ids[req.request_id]]

    def test_prewarm_covers_non_power_of_two_halvings(self, params):
        # _fused_chunk_len halves a headroom-squeezed chunk (48 -> 24 ->
        # 12 -> 6); prewarm must compile that closure, not just powers of
        # two (ADVICE r3: a 48-ceiling could stall on a cold 24-variant)
        eng = InferenceEngine(TINY, params, max_batch=4, max_len=128)
        n = eng.prewarm(loop_steps=48)
        # chunks {6,8,12,16,24,32,48} x lens {128} x piggy for {8,16,32}
        assert n == 10
        assert {k[0] for k in eng._loops} == {6, 8, 12, 16, 24, 32, 48}

    def test_prewarm_on_mesh_and_parity(self, params):
        # round-4 (VERDICT r3 item 8): sharded engines prewarm too. The
        # AOT-compiled variants must serve token-identically to an
        # unwarmed single-device engine, and prewarm must not execute
        # anything (the donated sharded cache stays untouched).
        import dataclasses

        from flash_attention_softmax_n_tpu.models import (
            init_decoder_params,
        )
        from flash_attention_softmax_n_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        cfg = dataclasses.replace(TINY, n_heads=8, n_kv_heads=4)
        mparams = init_decoder_params(cfg, jax.random.PRNGKey(0))
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8], [2, 7]]

        def run(mesh, prewarm):
            eng = InferenceEngine(cfg, mparams, max_batch=4, max_len=64,
                                  mesh=mesh)
            if prewarm:
                n = eng.prewarm(loop_steps=8)
                # chunks {8} x attn_len bucket {64}; no piggy under mesh
                assert n == (1 if mesh is not None else 2)
            for j, p in enumerate(prompts):
                eng.submit(p, max_new_tokens=6 + j)
            done = eng.run_until_done(loop_steps=8)
            return {r.request_id: r.output for r in done}

        ref = run(None, prewarm=False)
        mesh = make_mesh({"data": 2, "model": 4})
        assert run(mesh, prewarm=True) == ref


class TestPrefixCache:
    """register_prefix + prefix-hit admission (round 4, VERDICT r3 item
    9): hits must be token-identical to cold prefill, reuse must show in
    the counters, and non-matching traffic must be unaffected."""

    def _run(self, params, prompts, register, kv_quantization=None,
             prefill_chunk=16, max_len=128):
        eng = InferenceEngine(TINY, params, max_batch=4, max_len=max_len,
                              kv_quantization=kv_quantization,
                              prefill_chunk=prefill_chunk)
        for p in register:
            eng.register_prefix(p)
        ids = {eng.submit(p, max_new_tokens=6): tuple(p) for p in prompts}
        done = eng.run_until_done(loop_steps=8)
        return ({ids[r.request_id]: r.output for r in done},
                eng.counters_report())

    def test_hit_matches_cold_prefill(self, params):
        rng = np.random.RandomState(7)
        prefix = rng.randint(0, TINY.vocab_size, size=33).tolist()
        prompts = [
            prefix + rng.randint(0, TINY.vocab_size, size=n).tolist()
            for n in (5, 11, 2)
        ] + [rng.randint(0, TINY.vocab_size, size=40).tolist(),  # no match
             [4, 2]]                                             # short
        cold, _ = self._run(params, prompts, register=[])
        warm, counters = self._run(params, prompts, register=[prefix])
        assert counters.get("prefix_hits", 0) == 3
        # chunk=16: floor(33/16)*16 = 32 rows reused per hit
        assert counters.get("prefix_reused_tokens", 0) == 3 * 32
        assert warm == cold

    def test_hit_matches_with_quantized_cache(self, params):
        # the store is quantized like the cache, so a hit must be
        # BIT-identical to prefilling the same rows in place
        rng = np.random.RandomState(8)
        prefix = rng.randint(0, TINY.vocab_size, size=32).tolist()
        prompts = [prefix + rng.randint(0, TINY.vocab_size,
                                        size=n).tolist() for n in (3, 9)]
        cold, _ = self._run(params, prompts, register=[],
                            kv_quantization="int8")
        warm, counters = self._run(params, prompts, register=[prefix],
                                   kv_quantization="int8")
        assert counters.get("prefix_hits", 0) == 2
        assert warm == cold

    def test_prompt_equal_to_prefix(self, params):
        # prompt == registered prefix: at least one suffix token must
        # remain to produce the first sampled logits (reuse clamps to
        # whole chunks strictly inside the prompt)
        rng = np.random.RandomState(9)
        prefix = rng.randint(0, TINY.vocab_size, size=32).tolist()
        cold, _ = self._run(params, [prefix], register=[])
        warm, counters = self._run(params, [prefix], register=[prefix])
        assert counters.get("prefix_hits", 0) == 1
        assert counters.get("prefix_reused_tokens", 0) == 16  # one chunk
        assert warm == cold

    def test_longest_prefix_wins(self, params):
        rng = np.random.RandomState(10)
        short = rng.randint(0, TINY.vocab_size, size=16).tolist()
        long_ = short + rng.randint(0, TINY.vocab_size, size=16).tolist()
        prompt = long_ + [5, 6, 7]
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=128,
                              prefill_chunk=16)
        eng.register_prefix(short)
        eng.register_prefix(long_)
        m = eng._match_prefix(prompt)
        assert m is not None and m[1] == 32

    @pytest.mark.parametrize("kv_quantization", [None, "int8"])
    def test_meshed_hit_matches_cold(self, params, kv_quantization):
        # round-5 (VERDICT r4 item 5): sharded engines register and reuse
        # prefixes too — the store prefills with one identical slot per
        # data shard, is placed replicated-over-data / head-sharded-over-
        # model, and a meshed hit must be token-identical to a cold
        # single-device prefill of the same prompts.
        import dataclasses

        from flash_attention_softmax_n_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        cfg = dataclasses.replace(TINY, n_heads=8, n_kv_heads=4)
        mparams = init_decoder_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.RandomState(11)
        prefix = rng.randint(0, cfg.vocab_size, size=33).tolist()
        prompts = [prefix + rng.randint(0, cfg.vocab_size, size=n).tolist()
                   for n in (5, 11, 2)] + [[4, 2]]  # one non-matching

        def run(mesh, register):
            eng = InferenceEngine(cfg, mparams, max_batch=4, max_len=128,
                                  kv_quantization=kv_quantization,
                                  prefill_chunk=16, mesh=mesh)
            for p in register:
                eng.register_prefix(p)
            ids = {eng.submit(p, max_new_tokens=6): tuple(p)
                   for p in prompts}
            done = eng.run_until_done(loop_steps=8)
            return ({ids[r.request_id]: r.output for r in done},
                    eng.counters_report())

        cold, _ = run(None, [])
        mesh = make_mesh({"data": 2, "model": 4})
        warm, counters = run(mesh, [prefix])
        assert counters.get("prefix_hits", 0) == 3
        assert counters.get("prefix_reused_tokens", 0) == 3 * 32
        assert warm == cold

    def test_register_validation(self, params):
        eng = InferenceEngine(TINY, params, max_batch=2, max_len=64,
                              prefill_chunk=16)
        with pytest.raises(ValueError, match="prefill_chunk"):
            eng.register_prefix([1, 2, 3])
        with pytest.raises(ValueError, match="max_len"):
            eng.register_prefix(list(range(90)) * 2)


class TestAdmitGroupWidth:
    def test_wide_admission_group_matches(self, params, monkeypatch):
        # FASN_ADMIT_G=16: wider batched admission must stay
        # token-identical (padding rows scatter to a drop index)
        prompts = [[i + 1, i + 2, i + 3] for i in range(20)]
        expected = {tuple(p): reference_tokens(params, p, 5)
                    for p in prompts}

        monkeypatch.setenv("FASN_ADMIT_G", "16")
        eng = InferenceEngine(TINY, params, max_batch=32, max_len=64)
        assert eng._ADMIT_G == 16
        ids = {eng.submit(p, max_new_tokens=5): tuple(p) for p in prompts}
        done = eng.run_until_done(loop_steps=8)
        assert len(done) == 20
        for req in done:
            assert req.output == expected[ids[req.request_id]]


class TestFlushSplit:
    def test_split_flush_bit_identical_to_fused(self, params, monkeypatch):
        # round 5: above _FLUSH_SPLIT_ENVELOPE the tail flush runs
        # layer-by-layer (lax.map) instead of one fused op (the fused
        # flush's temporaries crash the Mosaic compile helper at
        # b896/w64 on v5e). The split path must be BIT-identical —
        # force it by shrinking the envelope and compare full decode
        # outputs and the final cache.
        import flash_attention_softmax_n_tpu.engine.engine as E

        prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

        def run():
            eng = InferenceEngine(TINY, params, max_batch=2, max_len=64,
                                  kv_quantization="int8")
            ids = {eng.submit(p, max_new_tokens=9): tuple(p)
                   for p in prompts}
            done = eng.run_until_done(loop_steps=8)
            cache = jax.tree.map(np.asarray, eng.cache)
            return {ids[r.request_id]: r.output for r in done}, cache

        fused_out, fused_cache = run()
        monkeypatch.setattr(E, "_FLUSH_SPLIT_ENVELOPE", 0)
        split_out, split_cache = run()
        assert split_out == fused_out
        for a, b in zip(jax.tree.leaves(fused_cache),
                        jax.tree.leaves(split_cache)):
            np.testing.assert_array_equal(a, b)
