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

__all__ = ["trace", "measure", "attention_roofline", "ChipSpec", "V5E",
           "V5P", "pytree_bytes", "estimate_decode_hbm_bytes",
           "check_decode_hbm_fit"]


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


def pytree_bytes(tree) -> int:
    """Total device bytes of a parameter pytree (QTensor-leaf aware —
    QTensors flatten into their values/scales arrays)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def estimate_decode_hbm_bytes(cfg, batch: int, max_len: int,
                              kv_quantization, params_bytes: int) -> dict:
    """Resident-HBM estimate for a continuous-batching decode engine.

    weights + KV cache + a workspace term for the largest transients the
    fused loop keeps live (per-chunk token/logit buffers, double-buffered
    layer activations, XLA scratch). The estimate exists to FENCE the
    known crash class where the Mosaic compile helper dies with an opaque
    'HTTP 500: subprocess exit code 1' instead of an OOM (observed:
    Llama-7B MHA at b=48 — int8 weights 6.7 GB + int8 KV 6.4 GB ~= 13.5 GB
    resident, artifacts/bench_7b.json), so its job is to be roughly right
    with a conservative margin, not exact.
    """
    kv_bytes_per = {None: 2, "int8": 1, "fp8": 1}.get(kv_quantization, 1)
    scale_bytes = 0 if kv_quantization is None else 4  # f32 per-token scale
    kv = (cfg.n_layers * batch * cfg.n_kv_heads * max_len
          * (cfg.head_dim * kv_bytes_per + scale_bytes) * 2)  # k and v
    # workspace: admission-group prefill logits (8 x 128-bucket x vocab
    # f32 — the engine's admission group and the bench's prompt bucket),
    # layer activations, attention stats. Calibrated against the known
    # good/bad 7B-class points: 8B-GQA b=96 (runs, 12.0 GB est) must pass
    # while 7B-MHA b=48 (crashes, 13.5 GB est) must not.
    workspace = (batch * cfg.d_model * 4 * 8
                 + 8 * min(128, max_len) * cfg.vocab_size * 4
                 + batch * cfg.n_heads * max_len * 4)
    total = params_bytes + kv + workspace
    return {"params": params_bytes, "kv_cache": kv,
            "workspace": workspace, "total": total}


def check_decode_hbm_fit(cfg, batch: int, max_len: int, kv_quantization,
                         params_bytes: int,
                         budget_bytes: int | None = None) -> dict:
    """Raise a first-party error when a decode config cannot fit HBM.

    ``budget_bytes`` defaults to FASN_HBM_BUDGET_GB (12.5 GB on v5e-16GB:
    the 13.5 GB-resident 7B b=48 config crashes the compile helper, the
    11.2 GB b=32/b=96 configs run — the margin covers XLA workspace the
    estimate cannot see). Returns the estimate breakdown when it fits.
    """
    import os

    if budget_bytes is None:
        budget_bytes = int(float(os.environ.get("FASN_HBM_BUDGET_GB",
                                                "12.5")) * 2 ** 30)
    est = estimate_decode_hbm_bytes(cfg, batch, max_len, kv_quantization,
                                    params_bytes)
    if est["total"] > budget_bytes:
        gb = 2 ** 30
        raise RuntimeError(
            f"decode config will not fit HBM: params "
            f"{est['params']/gb:.1f} GB + KV cache {est['kv_cache']/gb:.1f}"
            f" GB (batch={batch}, max_len={max_len}, "
            f"kv={kv_quantization or 'dense'}) + workspace "
            f"{est['workspace']/gb:.1f} GB = {est['total']/gb:.1f} GB > "
            f"budget {budget_bytes/gb:.1f} GB. Past this point the Mosaic "
            f"compile helper dies with an opaque 'HTTP 500: subprocess "
            f"exit code 1' (artifacts/bench_7b.json, 7B b=48). Reduce "
            f"batch/max_len, quantize the KV cache, or raise "
            f"FASN_HBM_BUDGET_GB if your chip has more memory.")
    return est


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
