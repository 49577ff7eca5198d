"""BERT encoder parity with HuggingFace + surgery semantics.

The reference proves surgery fidelity by monkey-patching real HF models and
asserting n=0 is a no-op while n=1 changes outputs
(tests/cpu/surgery/test_bert.py:10-37). We prove the stronger property: our
first-party encoder *reproduces HF BertModel numerics* from converted
weights (random-init torch model, no network), then the same n=0/n=1
invariants on top.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attention_softmax_n_tpu.models.bert import bert_forward
from flash_attention_softmax_n_tpu.surgery import (
    apply_attention_softmax_n,
    from_pretrained_hf,
)
from flash_attention_softmax_n_tpu.surgery.convert import (
    bert_config_from_hf,
    bert_params_from_hf,
)


@pytest.fixture(scope="module")
def tiny_hf_bert():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 7:] = 0  # ragged batch
    return ids, mask


class TestHFParity:
    def test_outputs_match_hf(self, tiny_hf_bert, inputs):
        ids, mask = inputs
        with torch.no_grad():
            hf_out = tiny_hf_bert(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            )
        cfg = bert_config_from_hf(tiny_hf_bert.config)
        params = bert_params_from_hf(tiny_hf_bert, cfg)
        out = bert_forward(params, cfg, jnp.asarray(ids),
                           attention_mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            out["last_hidden_state"],
            hf_out.last_hidden_state.numpy(), atol=2e-5)
        np.testing.assert_allclose(
            out["pooler_output"], hf_out.pooler_output.numpy(), atol=2e-5)

    def test_n0_surgery_is_noop(self, tiny_hf_bert, inputs):
        # reference invariant: surgery with n=0 leaves outputs unchanged
        # (test_bert.py:26)
        ids, mask = inputs
        cfg, params = from_pretrained_hf(tiny_hf_bert, softmax_n_param=0.0)
        out0 = bert_forward(params, cfg, jnp.asarray(ids),
                            attention_mask=jnp.asarray(mask))
        with torch.no_grad():
            hf_out = tiny_hf_bert(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            )
        np.testing.assert_allclose(
            out0["last_hidden_state"], hf_out.last_hidden_state.numpy(),
            atol=2e-5)

    def test_n1_surgery_changes_outputs(self, tiny_hf_bert, inputs):
        # reference invariant: surgery with n=1 changes outputs
        # (test_bert.py:30-37)
        ids, mask = inputs
        cfg0, params = from_pretrained_hf(tiny_hf_bert, softmax_n_param=0.0)
        cfg1, _ = apply_attention_softmax_n((cfg0, params), 1.0)
        assert cfg0.softmax_n == 0.0 and cfg1.softmax_n == 1.0
        out0 = bert_forward(params, cfg0, jnp.asarray(ids))
        out1 = bert_forward(params, cfg1, jnp.asarray(ids))
        assert not bool(jnp.allclose(out0["last_hidden_state"],
                                     out1["last_hidden_state"]))

    def test_taps_for_analysis(self, tiny_hf_bert, inputs):
        ids, mask = inputs
        cfg, params = from_pretrained_hf(tiny_hf_bert, softmax_n_param=1.0)
        out, taps = bert_forward(params, cfg, jnp.asarray(ids),
                                 collect_taps=True)
        assert set(taps) == {f"encoder.layer.{i}.attention.output"
                             for i in range(2)}
        assert taps["encoder.layer.0.attention.output"].shape == (2, 10, 32)


class TestBertQuantizedInference:
    """BASELINE configs[2]: BERT softmax-1 surgery + INT8 weight-only
    inference — the quantized encoder must track the dense one closely."""

    def test_int8_bert_close_to_dense(self, tiny_hf_bert):
        from flash_attention_softmax_n_tpu.quant import quantize_bert_weights
        from flash_attention_softmax_n_tpu.surgery import from_pretrained_hf

        cfg, params = from_pretrained_hf(tiny_hf_bert, softmax_n_param=1.0)
        qparams = quantize_bert_weights(params, bits=8)
        ids = jnp.asarray([[101, 2023, 2003, 1037, 3231, 102]], jnp.int32)
        mask = jnp.ones_like(ids)
        dense = bert_forward(params, cfg, ids,
                             attention_mask=mask)["last_hidden_state"]
        quant = bert_forward(qparams, cfg, ids,
                             attention_mask=mask)["last_hidden_state"]
        rel = (float(jnp.max(jnp.abs(quant - dense)))
               / float(jnp.max(jnp.abs(dense))))
        assert rel < 0.05
