"""In-place KV-cache row append for decode (Pallas, aliased).

XLA has no in-place scatter at per-slot dynamic positions: a vmapped
``dynamic_update_slice`` over batch lowers to a scatter that rewrites the
whole cache — for a 1B model at batch 8 that is ~0.9 ms of pure copy per
decode step, more than the attention itself. This kernel uses
``input_output_aliases`` so the cache stays where it is in HBM and only the
written rows move:

  * ONE call per decode step writes the new token's k/v rows for ALL layers
    (every layer writes slot ``b`` at the same position ``pos[b]``, so the
    layer axis folds into the block);
  * TPU block constraints forbid addressing a single sequence row, so the
    kernel read-modify-writes the aligned 8-row window containing the
    target row (a few hundred KB, vs hundreds of MB for the scatter);
  * positions ride scalar prefetch, grid = (batch,).

The engine composes this with kernels/decode_attention.py's ``k_new``/
``v_new`` self-term: attention never reads the post-write cache, so the
write has no consumer ordering constraint inside the step.

Capability net-new vs the reference (its KV cache is HF ``past_key_value``
pass-through, surgery/_bert.py:41-70); the in-place pattern is the TPU
equivalent of the reference kernels' owned-buffer updates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cache_append", "tail_append"]


def _tail_kernel(i_ref, kn_ref, vn_ref, k_in, v_in, k_out, v_out):
    i = i_ref[0]
    row = i - (i // 8) * 8
    sel = jax.lax.broadcasted_iota(jnp.int32, k_in.shape, 3) == row
    k_out[...] = jnp.where(sel, kn_ref[...], k_in[...])
    v_out[...] = jnp.where(sel, vn_ref[...], v_in[...])


def tail_append(k_tail: jax.Array, v_tail: jax.Array,
                k_new: jax.Array, v_new: jax.Array,
                index: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Write ``new[l, b]`` into ``tail[l, b, :, index, :]`` — SHARED index.

    The fused decode loop's per-step write: every slot appends at the same
    ring position (the loop's step counter), so unlike ``cache_append``
    there is no per-slot scatter — one aliased RMW of the aligned 8-row
    window per layer, independent of batch size (the per-slot scatter costs
    ~B x 55us; this is ~0.26ms at (16L, b=32) and flat in B).

    k/v_tail (NL, B, KVH, W, D); k/v_new (NL, B, KVH, D); index scalar.
    """
    nl, b, kvh, w, d = k_tail.shape
    idx = jnp.reshape(index, (1,)).astype(jnp.int32)
    # chunk the batch so the 4 double-buffered (k/v, in/out) blocks stay
    # within scoped VMEM (b=384 at the 1.1B shape otherwise allocates 24MB
    # against the 16MB limit)
    bs = b
    while bs > 128 and bs % 2 == 0 and bs * kvh * 8 * d * 2 * 4 * 2 > 8 << 20:
        bs //= 2
    spec = pl.BlockSpec((1, bs, kvh, 8, d),
                        lambda g, j, i: (g, j, 0, i[0] // 8, 0))
    nspec = pl.BlockSpec((1, bs, kvh, 1, d), lambda g, j, i: (g, j, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, b // bs),
        in_specs=[nspec, nspec, spec, spec],
        out_specs=[spec, spec],
    )
    ko, vo = pl.pallas_call(
        _tail_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k_tail.shape, k_tail.dtype),
                   jax.ShapeDtypeStruct(v_tail.shape, v_tail.dtype)],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(idx, k_new[:, :, :, None, :], v_new[:, :, :, None, :], k_tail, v_tail)
    return ko, vo


def _kernel(n_tensors, pos_ref, *refs):
    b = pl.program_id(0)
    pos = pos_ref[b]
    row = pos - (pos // 8) * 8
    news = refs[:n_tensors]
    ins = refs[n_tensors:2 * n_tensors]
    outs = refs[2 * n_tensors:]
    for new_ref, in_ref, out_ref in zip(news, ins, outs):
        sel = jax.lax.broadcasted_iota(jnp.int32, in_ref.shape, 3) == row
        # new_ref block is (NL, 1, KVH, 1, D): already 5D so no in-kernel
        # reshape (Mosaic can't shape-cast small non-lane-aligned vectors);
        # jnp.where broadcasts the length-1 row axis over the 8-row window
        out_ref[...] = jnp.where(sel, new_ref[...], in_ref[...])


def cache_append(caches: Tuple[jax.Array, ...],
                 news: Tuple[jax.Array, ...],
                 positions: jax.Array) -> Tuple[jax.Array, ...]:
    """Write ``news[i][l, b]`` into ``caches[i][l, b, :, positions[b], :]``.

    caches[i] (NL, B, KVH, S, D_i); news[i] (NL, B, KVH, D_i); positions
    (B,) int32 in [0, S). All caches must share (NL, B, KVH, S). Returns the
    updated caches; inputs are donated via input-output aliasing, so the
    update is in place when the caller's buffers are free (jit-internal
    values or donated arguments).

    D_i must be a multiple of 128, or small (<128) for scale planes —
    Pallas requires the last block dim to equal the array dim in that case.
    """
    n = len(caches)
    assert n == len(news) and n >= 1
    nl, b, kvh, s, _ = caches[0].shape

    in_specs = []
    out_specs = []
    for c in caches:
        d = c.shape[-1]
        spec = pl.BlockSpec((nl, 1, kvh, 8, d),
                            lambda i, pos: (0, i, 0, pos[i] // 8, 0))
        in_specs.append(spec)
        out_specs.append(spec)
    news = tuple(nw[:, :, :, None, :] for nw in news)
    new_specs = [
        pl.BlockSpec((nl, 1, kvh, 1, c.shape[-1]),
                     lambda i, pos: (0, i, 0, 0, 0))
        for c in caches
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=new_specs + in_specs,
        out_specs=out_specs,
    )
    out_shapes = [jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches]
    # input indices include the scalar-prefetch operand at 0: news occupy
    # [1, 1+n), caches [1+n, 1+2n) -> alias the caches to the outputs
    aliases = {1 + n + i: i for i in range(n)}

    outs = pl.pallas_call(
        functools.partial(_kernel, n),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(positions.astype(jnp.int32), *news, *caches)
    return tuple(outs)
