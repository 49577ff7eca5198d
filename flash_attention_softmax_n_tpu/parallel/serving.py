"""Tensor/data-parallel serving: the sharded continuous-batching decode.

BASELINE.json configs[4] ("7B softmax_1 ... tensor-sharded, cross-host
batching") — net-new capability the reference lacks entirely (SURVEY §2.3).
The TPU-native shape of it:

  * weights Megatron-sharded over the "model" axis, slots (and their KV
    cache + lengths) over the "data" axis (sharding.py specs);
  * decode/loop jitted over the mesh; XLA's SPMD partitioner inserts the
    TP collectives (psum after row-parallel matmuls) over ICI;
  * the in-place Pallas cache write (kernels/cache_update.py) runs inside
    a ``shard_map`` island — each shard appends its local heads/slots, no
    communication (writes are point-local by construction);
  * attention uses the XLA stats formulation (partitions automatically;
    per-slot lengths are data-sharded with their slots).

Use ``make_sharded_decode(cfg, mesh, num_steps)`` and feed it state placed
by ``shard_engine_state``. Works identically on a virtual CPU mesh (tests,
driver dry-run) and a real ICI mesh.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attention_softmax_n_tpu.models.decoder import DecoderConfig
from flash_attention_softmax_n_tpu.parallel.sharding import (
    decoder_param_specs,
    kv_cache_specs,
    shard_pytree,
)

__all__ = ["shard_engine_state", "make_sharded_decode"]


def _check_mesh(mesh: Mesh) -> None:
    missing = {"data", "model"} - set(mesh.axis_names)
    if missing:
        raise ValueError(
            f"serving mesh needs axes 'data' (slots) and 'model' (TP); "
            f"missing {sorted(missing)}. Got axes {list(mesh.axis_names)} — "
            f"use make_mesh({{'data': dp, 'model': tp}}).")


def shard_engine_state(params: Dict, cache: Dict, mesh: Mesh
                       ) -> Tuple[Dict, Dict]:
    """Place params (TP over 'model') and KV cache (DP x TP) on the mesh.

    max_batch (cache slot dim) must divide by the 'data' axis size and
    n_kv_heads by the 'model' axis size — checked here so violations fail
    with an actionable message instead of an opaque sharding error.
    """
    _check_mesh(mesh)
    dp = mesh.shape["data"]
    tp = mesh.shape["model"]
    kv = cache.get("k")
    if kv is not None:
        shape = kv.values.shape if hasattr(kv, "values") else kv.shape
        max_batch, n_kv_heads = shape[1], shape[2]
        if max_batch % dp != 0:
            raise ValueError(
                f"max_batch={max_batch} must be divisible by the 'data' "
                f"axis size {dp} (slots are data-sharded)")
        if n_kv_heads % tp != 0:
            raise ValueError(
                f"n_kv_heads={n_kv_heads} must be divisible by the 'model' "
                f"axis size {tp} (KV heads are tensor-sharded)")
    if "wqkv" in params.get("layers", {}):
        raise ValueError(
            "fused projections (wqkv/w_gu) cannot be tensor-sharded: the "
            "Megatron column split would cut across q/k/v boundaries. "
            "Quantize without fuse_decoder_projections for TP serving.")
    params = shard_pytree(params, decoder_param_specs(params), mesh)
    cache = shard_pytree(cache, kv_cache_specs(cache), mesh)
    return params, cache


def make_sharded_decode(cfg: DecoderConfig, mesh: Mesh, *,
                        num_steps: int = 1,
                        eos_token: Optional[int] = None,
                        temperature: float = 0.0,
                        per_slot_sampling: bool = False,
                        donate: bool = True):
    """Compile the fused decode loop over the mesh.

    Returns ``loop(params, tokens, cache, active) -> (tokens_out, cache',
    active')`` with tokens/active data-sharded. Inputs must be placed with
    ``shard_engine_state`` (params/cache); tokens/active may be host arrays
    (jit constrains them to the data axis).

    ``per_slot_sampling=True`` compiles the per-slot variant instead:
    ``loop(params, tokens, cache, active, rng, temps, top_k, top_p)`` with
    (B,) sampling settings data-sharded like the tokens — mixed greedy /
    temperature / top-k / nucleus slots share the one executable
    (ops/sampling.py; ``temperature``/scalar mode is then ignored).
    """
    from flash_attention_softmax_n_tpu.engine.engine import engine_decode_loop

    tok_sharding = NamedSharding(mesh, P("data"))

    if per_slot_sampling:
        def fn(params, tokens, cache, active, rng, temps, top_k, top_p):
            return engine_decode_loop(
                params, cfg, tokens, cache, active, num_steps=num_steps,
                eos_token=eos_token, rng=rng, temps=temps, top_k=top_k,
                top_p=top_p, mesh=mesh)
    else:
        def fn(params, tokens, cache, active):
            return engine_decode_loop(
                params, cfg, tokens, cache, active, num_steps=num_steps,
                eos_token=eos_token, temperature=temperature, mesh=mesh)

    kwargs = dict(donate_argnames=("cache",)) if donate else {}
    return jax.jit(
        fn,
        out_shardings=(tok_sharding, None, tok_sharding),
        **kwargs,
    )
