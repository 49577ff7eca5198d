"""flash-attention-softmax-n for TPU — a JAX/Pallas-native framework.

TPU-first re-design of the reference ``flash-attention-softmax-n`` library
(reference: /root/reference, package __init__.py:3-12): softmax-N attention
primitives, a fused Pallas flash-attention kernel with the ``+n`` term folded
into the online-softmax statistics, checkpoint surgery, activation/weight
statistics, quantization, and a sharded inference engine.

Public API mirrors the reference's top-level re-exports::

    from flash_attention_softmax_n_tpu import (
        softmax_n, slow_attention_n, flash_attention_n,
    )
"""

import functools as _functools
import warnings as _warnings

from flash_attention_softmax_n_tpu.ops.functional import slow_attention_n, softmax_n
from flash_attention_softmax_n_tpu.ops.flash_attention import flash_attention_n

# The reference exposes a TRITON_INSTALLED flag for its optional GPU kernel
# (reference __init__.py:5-9). On TPU the fused kernel is first-party Pallas,
# always present; the flag is kept for API familiarity.
PALLAS_INSTALLED = True
TRITON_INSTALLED = False  # no Triton on TPU; the Pallas kernel replaces it


@_functools.wraps(flash_attention_n)
def flash_attention_n_triton(*args, **kwargs):
    """Migration alias for the reference's Triton entry point
    (core/flash_attn_triton.py:339): routes to the Pallas kernel, which
    covers the Triton path's feature set (real-valued n, fp16/bf16) plus
    the gaps it documented (masks/bias/ALiBi, causal exact for all n)."""
    _warnings.warn(
        "flash_attention_n_triton is the reference API's name; on TPU it "
        "routes to the Pallas kernel. Call flash_attention_n directly.",
        stacklevel=2)
    kwargs.setdefault("implementation", "pallas")
    return flash_attention_n(*args, **kwargs)


__version__ = "0.1.0"

__all__ = [
    "softmax_n",
    "slow_attention_n",
    "flash_attention_n",
    "flash_attention_n_triton",
    "PALLAS_INSTALLED",
    "TRITON_INSTALLED",
]
