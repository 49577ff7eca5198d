from flash_attention_softmax_n_tpu.utils.checkpoint import (
    load_checkpoint,
    load_train_checkpoint,
    save_checkpoint,
    save_train_checkpoint,
)
from flash_attention_softmax_n_tpu.utils.profiling import (
    V5E,
    V5P,
    ChipSpec,
    attention_roofline,
    measure,
    trace,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_train_checkpoint",
    "load_train_checkpoint",
    "trace",
    "measure",
    "attention_roofline",
    "ChipSpec",
    "V5E",
    "V5P",
]
