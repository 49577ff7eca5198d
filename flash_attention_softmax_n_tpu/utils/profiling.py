"""Profiling and roofline analysis for the attention kernels.

The reference has no tracing/profiling subsystem (SURVEY §5); the TPU
framework ships one because the north-star metric includes "attn kernel % of
SOL". Provides:

  * ``trace(path)`` — context manager around ``jax.profiler`` for on-device
    traces viewable in TensorBoard/Perfetto;
  * ``attention_roofline(...)`` — analytic speed-of-light model for flash
    attention on a chip (FLOPs vs bytes, MXU vs HBM bound);
  * ``measure(fn, *args)`` — relay-safe wall-clock timing (closes every
    measurement with a host transfer; plain block_until_ready is unreliable
    through remote-device relays).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "measure", "attention_roofline", "ChipSpec", "V5E", "V5P"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_flops: float  # peak bf16 FLOP/s
    int8_ops: float    # peak int8 OP/s
    hbm_bw: float      # bytes/s


V5E = ChipSpec("v5e", 197e12, 394e12, 819e9)
V5P = ChipSpec("v5p", 459e12, 918e12, 2765e9)


@contextlib.contextmanager
def trace(path: str = "/tmp/jax-trace"):
    """jax.profiler trace context (TensorBoard-viewable)."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def measure(fn: Callable, *args, iters: int = 10, **kwargs) -> float:
    """Median-free mean seconds per call, closed by a host transfer."""
    out = fn(*args, **kwargs)
    _host_sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _host_sync(out)
    return (time.time() - t0) / iters


def _host_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def attention_roofline(batch: int, heads: int, q_len: int, kv_len: int,
                       head_dim: int, *, causal: bool = False,
                       dtype_bytes: int = 2,
                       chip: ChipSpec = V5E) -> dict:
    """Speed-of-light estimate for one flash-attention forward.

    Returns flops, bytes, the compute/memory-bound times, and the SOL time
    (max of the two). ``percent_of_sol(measured)`` = sol_time / measured.
    """
    frac = 0.5 if causal and q_len == kv_len else 1.0
    flops = 4 * batch * heads * q_len * kv_len * head_dim * frac
    bytes_accessed = dtype_bytes * batch * heads * (
        2 * q_len * head_dim + 2 * kv_len * head_dim)
    t_compute = flops / chip.bf16_flops
    t_memory = bytes_accessed / chip.hbm_bw
    sol = max(t_compute, t_memory)
    return {
        "flops": flops,
        "bytes": bytes_accessed,
        "t_compute": t_compute,
        "t_memory": t_memory,
        "sol_time": sol,
        "bound": "compute" if t_compute >= t_memory else "memory",
        "percent_of_sol": lambda measured: 100.0 * sol / measured,
    }
