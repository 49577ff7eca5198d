"""Moment-statistics kernels: mean/variance/skewness/excess-kurtosis.

JAX re-design of the reference's analysis/statistics.py:10-79. All functions
are pure jnp reductions — jittable, fusable by XLA, and usable *inside* a
compiled training step (the reference computes them eagerly in forward hooks
with a host sync per stat; here they fold into the step program).

Conventions (matching the reference):
  * ``kurtosis`` is the *excess* kurtosis (k4 / var^2 - 3; statistics.py:41-45),
    so a normal distribution scores 0.
  * ``*_batch_mean`` variants compute the statistic per sample (reducing over
    all non-batch axes) and then average over the batch (statistics.py:48-79).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "central_moment",
    "variance",
    "std",
    "standardized_moment",
    "skewness",
    "kurtosis",
    "mean_batch_mean",
    "variance_batch_mean",
    "skewness_batch_mean",
    "kurtosis_batch_mean",
]


def central_moment(x, k: int):
    """k-th central moment over all elements: E[(x - E[x])^k]."""
    x = x.astype(jnp.float32)
    return jnp.mean((x - jnp.mean(x)) ** k)


def variance(x):
    return central_moment(x, 2)


def std(x):
    return jnp.sqrt(variance(x))


def standardized_moment(x, k: int):
    """k-th standardized moment: E[(x - mu)^k] / sigma^k."""
    return central_moment(x, k) / std(x) ** k


def skewness(x):
    return standardized_moment(x, 3)


def kurtosis(x):
    """Excess kurtosis: k4 / var^2 - 3 (0 for a normal distribution)."""
    return central_moment(x, 4) / variance(x) ** 2 - 3.0


def _per_sample_axes(x):
    return tuple(range(1, x.ndim))


def _central_moment_per_sample(x, k: int):
    x = x.astype(jnp.float32)
    axes = _per_sample_axes(x)
    mu = jnp.mean(x, axis=axes, keepdims=True)
    return jnp.mean((x - mu) ** k, axis=axes)


def mean_batch_mean(x):
    return jnp.mean(x.astype(jnp.float32))


def variance_batch_mean(x):
    """Per-sample variance (axes 1..ndim), then batch mean."""
    return jnp.mean(_central_moment_per_sample(x, 2))


def skewness_batch_mean(x):
    m2 = _central_moment_per_sample(x, 2)
    m3 = _central_moment_per_sample(x, 3)
    return jnp.mean(m3 / m2 ** 1.5)


def kurtosis_batch_mean(x):
    m2 = _central_moment_per_sample(x, 2)
    m4 = _central_moment_per_sample(x, 4)
    return jnp.mean(m4 / m2 ** 2 - 3.0)
