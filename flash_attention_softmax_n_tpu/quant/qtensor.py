"""Quantized tensor container + quantize/dequantize primitives.

North-star net-new capability (BASELINE.json): softmax-N's outlier-free
activations enable aggressive INT8/FP8 activation + KV-cache quantization and
INT4/INT8 weight-only quantization. This module is the data layer: a pytree-
registered ``QTensor`` (values + scales) with symmetric per-axis scaling.

Supported formats:
  * int8  — symmetric, per-channel or per-token scales
  * int4  — two nibbles packed per int8 byte along the contraction axis
  * fp8   — float8_e4m3fn storage with per-channel scales
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["QTensor", "quantize", "dequantize", "pack_int4", "unpack_int4"]

INT4_MAX = 7.0
INT8_MAX = 127.0
FP8_MAX = 448.0  # float8_e4m3fn max normal


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """values + scales; ``dequantize(qt) == values.astype(f32) * scales``.

    ``scales`` broadcasts against the *logical* (unpacked) value shape.
    For int4, ``values`` holds two nibbles per byte along ``packed_axis``.
    """

    values: jax.Array
    scales: jax.Array
    bits: int = 8
    packed_axis: Optional[int] = None  # set for int4

    @property
    def logical_shape(self) -> Tuple[int, ...]:
        shape = list(self.values.shape)
        if self.packed_axis is not None:
            shape[self.packed_axis] *= 2
        return tuple(shape)

    def tree_flatten(self):
        return (self.values, self.scales), (self.bits, self.packed_axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        values, scales = children
        return cls(values, scales, bits=aux[0], packed_axis=aux[1])


INT4_GROUP = 256  # rows per packing group (two 128-sublane halves)


def _int4_group(axis_len: int) -> int:
    """Packing group: 256 when the axis tiles by it, else the whole axis.

    Grouped packing keeps the unpack *local*: a byte at group-row i holds
    original rows (g*G + i) and (g*G + G/2 + i), so any tile that covers
    whole groups (block_k % 256 == 0) can unpack itself without seeing the
    rest of the tensor — the property the fused dequant-matmul kernel needs.
    """
    return INT4_GROUP if axis_len % INT4_GROUP == 0 else axis_len


def pack_int4(x: jax.Array, axis: int) -> jax.Array:
    """Pack int8 values in [-8, 7] into nibbles, two per byte along ``axis``."""
    if x.shape[axis] % 2:
        raise ValueError(f"axis {axis} length must be even to pack int4")
    axis = axis % x.ndim
    g = _int4_group(x.shape[axis])
    # reshape axis -> (num_groups, g), split each group into halves
    shape = x.shape[:axis] + (x.shape[axis] // g, g) + x.shape[axis + 1:]
    xg = x.reshape(shape)
    lo, hi = jnp.split(xg, 2, axis=axis + 1)
    packed = (hi.astype(jnp.int8) << 4) | (lo.astype(jnp.int8) & 0x0F)
    out_shape = x.shape[:axis] + (x.shape[axis] // 2,) + x.shape[axis + 1:]
    return packed.astype(jnp.int8).reshape(out_shape)


def unpack_int4(packed: jax.Array, axis: int) -> jax.Array:
    """Inverse of pack_int4: int8 bytes -> int8 values in [-8, 7]."""
    axis = axis % packed.ndim
    g2 = _int4_group(packed.shape[axis] * 2) // 2
    shape = (packed.shape[:axis] + (packed.shape[axis] // g2, g2)
             + packed.shape[axis + 1:])
    pg = packed.reshape(shape)
    lo = jnp.right_shift(jnp.left_shift(pg, 4), 4)  # sign-extend low nibble
    hi = jnp.right_shift(pg, 4)
    xg = jnp.concatenate([lo, hi], axis=axis + 1)
    out_shape = (packed.shape[:axis] + (packed.shape[axis] * 2,)
                 + packed.shape[axis + 1:])
    return xg.reshape(out_shape).astype(jnp.int8)


def quantize(x: jax.Array, bits: int = 8, axis: int = -1,
             scale_dtype=jnp.float32) -> QTensor:
    """Symmetric quantization with per-slice absmax scales along ``axis``.

    ``axis`` is the *reduction* axis for the scale (one scale per slice
    orthogonal to it) — e.g. a (K, N) weight with axis=0 gets per-output-
    channel (1, N) scales, so dequant commutes with the matmul epilogue.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    if bits == 8:
        qmax = INT8_MAX
    elif bits == 4:
        qmax = INT4_MAX
    elif bits == -8:  # fp8 marker
        qmax = FP8_MAX
    else:
        raise ValueError(f"unsupported bits {bits}")
    scales = (absmax / qmax).astype(scale_dtype)
    safe = jnp.where(scales == 0, 1.0, scales.astype(jnp.float32))

    if bits == -8:
        values = (xf / safe).astype(jnp.float8_e4m3fn)
        return QTensor(values, scales, bits=-8)

    q = jnp.clip(jnp.round(xf / safe), -qmax - 1, qmax).astype(jnp.int8)
    if bits == 4:
        # store the packed axis in negative form so the QTensor stays valid
        # when leading axes are sliced away (e.g. lax.scan over stacked
        # layer weights)
        ax = axis % x.ndim - x.ndim
        return QTensor(pack_int4(q, ax), scales, bits=4, packed_axis=ax)
    return QTensor(q, scales, bits=8)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    values = qt.values
    if qt.bits == 4:
        values = unpack_int4(values, qt.packed_axis)
    return (values.astype(jnp.float32) * qt.scales.astype(jnp.float32)).astype(
        dtype
    )
