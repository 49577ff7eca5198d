from flash_attention_softmax_n_tpu.ops.functional import slow_attention_n, softmax_n
from flash_attention_softmax_n_tpu.ops.flash_attention import flash_attention_n
from flash_attention_softmax_n_tpu.ops.sampling import sample_tokens

__all__ = ["softmax_n", "slow_attention_n", "flash_attention_n",
           "sample_tokens"]
