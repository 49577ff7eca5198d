"""Surgery registry and apply-API tests.

Mirrors the reference's registry test surface
(tests/cpu/surgery/test_register.py:18-92 and utils.py validation): signature
validation, duplicate rejection, end-to-end custom-architecture registration,
warn-on-no-effect, and the Algorithm-object form.
"""

import dataclasses
import logging

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_softmax_n_tpu.models.bert import BertConfig
from flash_attention_softmax_n_tpu.surgery import (
    AttentionSoftmaxN,
    apply_attention_softmax_n,
    policy_registry,
)
from flash_attention_softmax_n_tpu.surgery.registry import PolicyRegistry


class TestRegistryValidation:
    def test_wrong_arity_rejected(self):
        reg = PolicyRegistry()
        with pytest.raises(TypeError, match="exactly"):
            @reg.register("foo")
            def bad(config, softmax_n_param: float):
                return config, {}

    def test_wrong_third_name_rejected(self):
        reg = PolicyRegistry()
        with pytest.raises(TypeError, match="softmax_n_param"):
            @reg.register("foo")
            def bad(config, params, n: float):
                return config, params

    def test_wrong_annotation_rejected(self):
        reg = PolicyRegistry()
        with pytest.raises(TypeError, match="annotated float"):
            @reg.register("foo")
            def bad(config, params, softmax_n_param: int):
                return config, params

    def test_duplicate_rejected(self):
        reg = PolicyRegistry()

        @reg.register("foo")
        def ok(config, params, softmax_n_param: float):
            return config, params

        with pytest.raises(ValueError, match="already"):
            @reg.register("foo")
            def dup(config, params, softmax_n_param: float):
                return config, params

    def test_invalid_key_rejected(self):
        reg = PolicyRegistry()
        with pytest.raises((TypeError, ValueError)):
            reg.register(42)(lambda config, params, softmax_n_param: None)

    def test_builtin_registrations_present(self):
        from flash_attention_softmax_n_tpu.models.decoder import DecoderConfig
        assert policy_registry.lookup(BertConfig()) is not None
        assert policy_registry.lookup(DecoderConfig()) is not None


class TestApply:
    def test_bert_config_rewrite(self):
        cfg = BertConfig(softmax_n=0.0)
        new_cfg, params = apply_attention_softmax_n((cfg, {}), 4.0)
        assert new_cfg.softmax_n == 4.0
        assert cfg.softmax_n == 0.0  # pure rewrite, input untouched

    def test_idempotent(self):
        cfg = BertConfig()
        c1, p1 = apply_attention_softmax_n((cfg, {}), 1.0)
        c2, p2 = apply_attention_softmax_n((c1, p1), 1.0)
        assert c1 == c2

    def test_negative_n_rejected(self):
        with pytest.raises(ValueError):
            apply_attention_softmax_n((BertConfig(), {}), -1.0)

    def test_missing_n_rejected(self):
        with pytest.raises(ValueError):
            apply_attention_softmax_n((BertConfig(), {}))

    def test_unregistered_warns_and_is_noop(self, caplog):
        @dataclasses.dataclass
        class UnknownConfig:
            softmax_n: float = 0.0

        cfg = UnknownConfig()
        with caplog.at_level(logging.WARNING):
            out_cfg, _ = apply_attention_softmax_n((cfg, {}), 1.0)
        assert out_cfg.softmax_n == 0.0
        assert any("not registered" in r.message for r in caplog.records)

    def test_hf_model_type_string_lookup(self):
        # configs exposing model_type resolve through string registration
        @dataclasses.dataclass
        class HFLikeConfig:
            softmax_n: float = 0.0
            model_type: str = "roberta"

        # 'roberta' maps to the BERT converter, which does
        # dataclasses.replace(config, softmax_n=...)
        out_cfg, _ = apply_attention_softmax_n((HFLikeConfig(), {}), 2.0)
        assert out_cfg.softmax_n == 2.0


class TestCustomArchitectureEndToEnd:
    """Reference test_register.py pattern: register a custom architecture and
    verify surgery changes model output as the converter prescribes."""

    def test_register_and_apply(self):
        reg = PolicyRegistry()

        @dataclasses.dataclass(frozen=True)
        class DoubleAttentionConfig:
            softmax_n: float = 0.0
            gain: float = 1.0

        @reg.register(DoubleAttentionConfig)
        def double_converter(config, params, softmax_n_param: float):
            # a converter may rewrite params too, not just config
            new_params = {k: v * 2.0 for k, v in params.items()}
            return (dataclasses.replace(config, softmax_n=softmax_n_param),
                    new_params)

        cfg = DoubleAttentionConfig()
        params = {"w": jnp.ones((2, 2))}
        fn = reg.lookup(cfg)
        new_cfg, new_params = fn(cfg, params, 1.0)
        assert new_cfg.softmax_n == 1.0
        np.testing.assert_allclose(new_params["w"], 2 * np.ones((2, 2)))


class TestAlgorithmForm:
    def test_fires_on_init_event(self):
        class State:
            config = BertConfig()
            params = {}

        algo = AttentionSoftmaxN(softmax_n_param=1.0)
        assert algo.required_on_load()
        assert algo.match("init", State)
        assert not algo.match("batch_start", State)
        algo.apply("init", State)
        assert State.config.softmax_n == 1.0
