from flash_attention_softmax_n_tpu.kernels.flash_attention import (
    FlashConfig,
    flash_attention_n_fused,
)

__all__ = ["flash_attention_n_fused", "FlashConfig"]
