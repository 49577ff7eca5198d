from flash_attention_softmax_n_tpu.engine.engine import (
    InferenceEngine,
    Request,
    engine_decode,
    engine_prefill,
)

__all__ = ["InferenceEngine", "Request", "engine_prefill", "engine_decode"]
