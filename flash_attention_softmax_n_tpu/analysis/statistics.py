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
    "null_attention_mass",
    "attention_entropy",
    "summarize_attention",
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


# ----------------------------------------------------------------------------
# Attention-probability statistics (round 3)
#
# softmax-N's premise ("Attention Is Off By One", reference README.md:4) is
# that heads should be able to attend to NOTHING: with n > 0 a row's
# probabilities sum to sum_j exp(s_j) / (n + sum_j exp(s_j)) < 1, and the
# deficit is exactly the mass parked on the phantom key. These reductions
# quantify that on the probabilities the models now expose via
# output_attentions (models/{decoder,bert,xlnet}) — the direct measurement
# of the mechanism the surgery installs, complementing the activation
# moments that measure its downstream effect (outlier suppression).
# ----------------------------------------------------------------------------


def null_attention_mass(probs, axis: int = -1):
    """Per-row mass on the phantom key: 1 - sum_j p_j, in [0, 1].

    ``probs`` are softmax-N attention probabilities (any layout, key axis
    ``axis``). 0 everywhere for softmax-0; rows that "switch off" under
    softmax-N approach 1. NOTE: pass PRE-dropout probabilities (eval-mode
    output_attentions) — inverted-dropout rescaling breaks the sum.
    """
    return 1.0 - jnp.sum(probs.astype(jnp.float32), axis=axis)


def attention_entropy(probs, axis: int = -1):
    """Shannon entropy (nats) of each attention row INCLUDING the phantom
    key's mass as one extra outcome — the sharpness measure that stays
    well-defined when rows don't sum to 1."""
    p = probs.astype(jnp.float32)
    null = jnp.clip(1.0 - jnp.sum(p, axis=axis), 0.0, 1.0)
    plogp = jnp.where(p > 0.0, p * jnp.log(p), 0.0)
    nlogn = jnp.where(null > 0.0, null * jnp.log(null), 0.0)
    return -(jnp.sum(plogp, axis=axis) + nlogn)


def summarize_attention(probs):
    """Per-head summary of softmax-N attention behavior.

    ``probs`` is (B, H, L, S) or (n_layers, B, H, L, S) — exactly what the
    models return from ``output_attentions=True`` (eval mode; see
    null_attention_mass on dropout). Reduces over batch and query rows,
    keeping (H,) or (n_layers, H): {'null_mass_mean', 'null_mass_max',
    'entropy_mean'} — the numbers one inspects to see WHICH heads learned
    to idle after softmax-N surgery.
    """
    if probs.ndim not in (4, 5):
        raise ValueError(
            "expected (B, H, L, S) or (n_layers, B, H, L, S) attention "
            f"probabilities, got shape {probs.shape}")
    null = null_attention_mass(probs)  # (..., B, H, L)
    ent = attention_entropy(probs)
    batch_ax, query_ax = probs.ndim - 4, probs.ndim - 2
    reduce_axes = (batch_ax, query_ax)
    return {
        "null_mass_mean": jnp.mean(null, axis=reduce_axes),
        "null_mass_max": jnp.max(null, axis=reduce_axes),
        "entropy_mean": jnp.mean(ent, axis=reduce_axes),
    }
