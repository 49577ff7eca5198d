"""Tensor-parallel sharding rules for the decoder/encoder parameter pytrees.

Megatron-style TP over the "model" mesh axis, expressed as PartitionSpecs
and compiled by XLA's SPMD partitioner (the scaling-book recipe: annotate,
let XLA insert the collectives over ICI):

  * attention qkv projections: column-parallel (heads sharded),
  * attention output projection: row-parallel (psum inserted by XLA),
  * MLP gate/up: column-parallel; down: row-parallel,
  * embeddings/lm_head sharded on the hidden/vocab axis,
  * norms replicated.

Works for dense and quantized (QTensor) parameters: scales shard like their
values' output-channel axis.
"""

from __future__ import annotations

import logging

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attention_softmax_n_tpu.quant.qtensor import QTensor

__all__ = ["decoder_param_specs", "kv_cache_specs", "shard_pytree",
           "batch_spec", "param_shardings", "zero1_opt_shardings"]

# leaf name -> (dense spec, scales spec) for stacked (n_layers, K, N) weights
_DECODER_LAYER_RULES: Dict[str, P] = {
    # column-parallel: shard output (head) dim
    "wq": P(None, None, "model"),
    "wk": P(None, None, "model"),
    "wv": P(None, None, "model"),
    "w_gate": P(None, None, "model"),
    "w_up": P(None, None, "model"),
    # row-parallel: shard input dim; XLA psums the partial outputs
    "wo": P(None, "model", None),
    "w_down": P(None, "model", None),
    # norms replicated
    "attn_norm": P(None, None),
    "mlp_norm": P(None, None),
}

_DECODER_TOP_RULES: Dict[str, P] = {
    "embed": P(None, "model"),      # hidden-sharded embedding table
    "final_norm": P(None),
    "lm_head": P(None, "model"),    # vocab-sharded logits
}


def _spec_for(name: str, leaf, rules: Dict[str, P]):
    spec = rules.get(name)
    if spec is None:
        return P()
    if isinstance(leaf, QTensor):
        # values shard like the dense weight; scales (.., 1, N) shard on the
        # output-channel axis only (never on the contracted axis)
        scale_spec = P(*[None if i != len(spec) - 1 else spec[-1]
                         for i in range(len(spec))])
        return QTensor(spec, scale_spec, bits=leaf.bits,
                       packed_axis=leaf.packed_axis)
    return spec


def decoder_param_specs(params: Dict) -> Dict:
    """PartitionSpec pytree matching a decoder params pytree (dense or
    quantized)."""
    specs = {
        "embed": _DECODER_TOP_RULES["embed"],
        "layers": {
            name: _spec_for(name, leaf, _DECODER_LAYER_RULES)
            for name, leaf in params["layers"].items()
        },
        "final_norm": _DECODER_TOP_RULES["final_norm"],
    }
    if "lm_head" in params:
        specs["lm_head"] = _spec_for("lm_head", params["lm_head"],
                                     _DECODER_TOP_RULES)
    return specs


def kv_cache_specs(cache: Dict) -> Dict:
    """KV cache (n_layers, B, KVH, S, hd): batch on 'data', heads on 'model'."""
    kv_spec = P(None, "data", "model", None, None)

    def leaf_spec(leaf):
        if isinstance(leaf, QTensor):
            return QTensor(kv_spec, kv_spec, bits=leaf.bits,
                           packed_axis=leaf.packed_axis)
        return kv_spec

    specs = {
        "k": leaf_spec(cache["k"]),
        "v": leaf_spec(cache["v"]),
    }
    if "lengths" in cache:
        specs["lengths"] = P("data")
    if "length" in cache:
        specs["length"] = P()
    return specs


def batch_spec() -> P:
    """Token batches shard on the 'data' axis."""
    return P("data", None)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop mesh axes from dims they don't divide (e.g. odd vocab sizes).

    Production models pad vocab/hidden to multiples of the TP degree; for
    arbitrary checkpoints we degrade to replication on the offending dim
    instead of erroring — LOUDLY, because a silently replicated weight is
    a perf cliff (full copy per device + no TP speedup on its matmul).
    """
    fitted = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            fitted.append(None if i >= len(shape) else axis)
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else 1
        if shape[i] % size == 0:
            fitted.append(axis)
        else:
            logging.warning(
                "sharding relaxed to replication: dim %d of shape %s does "
                "not divide mesh axis %r (size %d) — pad this dim to a "
                "multiple of %d to restore tensor parallelism",
                i, tuple(shape), axis, size, size)
            fitted.append(None)
    return P(*fitted)


def shard_pytree(tree, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding (QTensor-aware).

    Specs whose mesh axis doesn't divide the corresponding dim are relaxed
    to replication on that dim.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    if len(leaves) != len(spec_leaves):
        raise ValueError("specs pytree does not match params pytree")
    shardings = [
        NamedSharding(mesh, _fit_spec(s, l.shape, mesh))
        for l, s in zip(leaves, spec_leaves)
    ]
    placed = [jax.device_put(l, s) for l, s in zip(leaves, shardings)]
    return jax.tree_util.tree_unflatten(treedef, placed)


def _zero1_extend(spec: P, shape, mesh: Mesh, data_axis: str) -> P:
    """Add ``data_axis`` to a param spec on the largest unsharded, divisible
    dim — the ZeRO-1 placement for that param's optimizer moments. Falls back
    to the unextended spec when no dim divides (small norms etc. stay
    replicated; they're negligible memory)."""
    flat = [a for e in spec if e is not None
            for a in (e if isinstance(e, tuple) else (e,))]
    if data_axis in flat:
        return spec
    size = mesh.shape[data_axis]
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_dim = 0, None
    for i, (e, d) in enumerate(zip(entries, shape)):
        if e is None and d % size == 0 and d > best:
            best, best_dim = d, i
    if best_dim is None:
        return P(*entries)
    entries[best_dim] = data_axis
    return P(*entries)


def zero1_opt_shardings(opt_state, params, specs, mesh: Mesh,
                        data_axis: str = "data"):
    """NamedSharding pytree for an optax state under ZeRO-1.

    Optimizer moments (any opt-state subtree mirroring the params pytree —
    Adam's mu/nu, etc.) get their param's TP spec EXTENDED with
    ``data_axis`` on the largest free dim, so each DP rank stores 1/dp of
    the moments (ZeRO-1 / optimizer-state sharding). XLA then turns the
    moment update into reduce-scatter(grads) + sharded update and the
    weight application into an all-gather — no user-space collectives,
    same numerics as replicated Adam.

    Matching is structural: an opt-state leaf whose tree path ends with a
    param's path (and has its shape) is that param's moment; everything
    else (step counts, empty states) is replicated.
    """
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    by_path = {}
    for (path, leaf), spec in zip(p_flat, spec_leaves):
        by_path[tuple(str(k) for k in path)] = (spec, tuple(leaf.shape))

    o_flat, o_treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = []
    for path, leaf in o_flat:
        keys = tuple(str(k) for k in path)
        shape = tuple(getattr(leaf, "shape", ()))
        spec = None
        for start in range(len(keys)):
            hit = by_path.get(keys[start:])
            if hit is not None and hit[1] == shape:
                spec = hit[0]
                break
        if spec is None:
            out.append(NamedSharding(mesh, P()))
            continue
        fitted = _fit_spec(spec, shape, mesh)
        out.append(NamedSharding(
            mesh, _zero1_extend(fitted, shape, mesh, data_axis)))
    return jax.tree_util.tree_unflatten(o_treedef, out)


def param_shardings(params, specs, mesh: Mesh):
    """Fitted NamedSharding pytree for jit in_shardings/out_shardings."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    shardings = [
        NamedSharding(mesh, _fit_spec(s, l.shape, mesh))
        for l, s in zip(leaves, spec_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)
