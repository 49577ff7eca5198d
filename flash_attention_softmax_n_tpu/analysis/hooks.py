"""Online activation statistics and post-hoc weight statistics.

TPU-native re-design of the reference's analysis/hooks.py. The reference
registers torch forward hooks that mutate a Python dict and `.item()` every
statistic to the host each step (hooks.py:28-52 — a host sync per stat per
module per batch). Here the collector is a **pytree of running statistics
threaded through the jitted step**: models expose named activation taps, and
`update_activation_stats` folds the same streaming batch-weighted update

    w = B / (n_samples + B);  stat <- (1 - w) * stat + w * f(acts)
    (reference hooks.py:40-49)

entirely on-device. Statistics reach the host only when the caller asks
(e.g. once per logging interval), not once per step.

Weight statistics (`compute_weight_statistics`) walk a parameter pytree and
report per-leaf {n_weights, kurtosis, skewness, variance, mean}
(reference hooks.py:88-99).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Mapping, Optional

import jax
import jax.numpy as jnp

from flash_attention_softmax_n_tpu.analysis.statistics import (
    kurtosis,
    kurtosis_batch_mean,
    mean_batch_mean,
    skewness,
    skewness_batch_mean,
    variance,
    variance_batch_mean,
)

__all__ = [
    "DEFAULT_LAYER_PATTERN",
    "init_activation_stats",
    "update_activation_stats",
    "register_activation_hooks",
    "activation_stats_to_dict",
    "compute_weight_statistics",
]

# The reference hooks any module whose name contains 'attention.output'
# (hooks.py:55-56); our models tap attention output projections under the
# same convention.
DEFAULT_LAYER_PATTERN = "attention.output"

# Statistic registry (reference hooks.py:19-24).
_ACTIVATION_STAT_FUNCS: Dict[str, Callable] = {
    "kurtosis": kurtosis_batch_mean,
    "skewness": skewness_batch_mean,
    "variance": variance_batch_mean,
    "mean": mean_batch_mean,
}


def _check_name(name: str, layers_to_save: Optional[Iterable[str]]) -> bool:
    if layers_to_save is None:
        return DEFAULT_LAYER_PATTERN in name
    return name in set(layers_to_save)


def init_activation_stats(layer_names: Iterable[str]):
    """Zero-initialized running-stats pytree for the given tap names."""
    return {
        name: {
            "n_samples": jnp.zeros((), jnp.int32),
            **{s: jnp.zeros((), jnp.float32) for s in _ACTIVATION_STAT_FUNCS},
        }
        for name in layer_names
    }


def update_activation_stats(stats, taps: Mapping[str, jax.Array]):
    """Fold one step's tapped activations into the running statistics.

    Pure and jittable: ``stats`` is the running pytree (from
    ``init_activation_stats``), ``taps`` maps tap name -> activation tensor
    (leading axis = batch). Returns the updated pytree. Tap names missing
    from ``stats`` are ignored (mirroring the reference's warn-and-continue,
    hooks.py:51-52 — under jit we silently skip; the registration API warns
    at setup time instead).
    """
    new_stats = dict(stats)
    for name, acts in taps.items():
        if name not in stats:
            continue
        entry = stats[name]
        batch = acts.shape[0]
        n_prev = entry["n_samples"]
        w = batch / (n_prev.astype(jnp.float32) + batch)
        updated = {"n_samples": n_prev + batch}
        for stat_name, fn in _ACTIVATION_STAT_FUNCS.items():
            updated[stat_name] = (1.0 - w) * entry[stat_name] + w * fn(acts)
        new_stats[name] = updated
    return new_stats


def register_activation_hooks(
    apply_fn: Callable,
    layer_names: Iterable[str],
    layers_to_save: Optional[Iterable[str]] = None,
):
    """Wrap a taps-producing apply function into (hooked_fn, initial_stats).

    The functional analogue of the reference's
    ``register_activation_hooks(model, layers_to_save)`` (hooks.py:59-85):

    * ``apply_fn(*args, **kwargs) -> (outputs, taps)`` where taps maps
      tap-name -> activation (our models' ``collect_taps=True`` mode).
    * ``layer_names``: all tap names the model can produce (the analogue of
      ``model.named_modules()``).
    * ``layers_to_save``: explicit selection; defaults to names containing
      ``'attention.output'``.

    Returns ``(hooked_fn, stats0)``; ``hooked_fn(stats, *args, **kwargs)``
    returns ``(outputs, new_stats)`` and is safe to jit.
    """
    import warnings

    selected = [n for n in layer_names if _check_name(n, layers_to_save)]
    if layers_to_save is not None:
        for name in set(layers_to_save) - set(layer_names):
            warnings.warn(f"requested layer {name!r} has no activation tap")

    stats0 = init_activation_stats(selected)

    def hooked_fn(stats, *args, **kwargs):
        outputs, taps = apply_fn(*args, **kwargs)
        taps = {k: v for k, v in taps.items() if k in stats}
        return outputs, update_activation_stats(stats, taps)

    return hooked_fn, stats0


def activation_stats_to_dict(stats) -> Dict[str, Dict[str, float]]:
    """Device pytree -> plain Python floats (one host sync, for JSON I/O)."""
    host = jax.device_get(stats)
    return {
        name: {k: (int(v) if k == "n_samples" else float(v))
               for k, v in entry.items()}
        for name, entry in host.items()
    }


def compute_weight_statistics(params) -> Dict[str, Dict[str, float]]:
    """Per-parameter statistics over a pytree of weights.

    The pytree analogue of iterating ``model.named_parameters()``
    (reference hooks.py:88-99): keys are '/'-joined pytree paths, values are
    {n_weights, kurtosis, skewness, variance, mean}.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    results = {}
    for path, leaf in flat:
        name = "/".join(_path_entry_str(p) for p in path)
        leaf = jnp.asarray(leaf)
        results[name] = {
            "n_weights": int(leaf.size),
            "kurtosis": float(kurtosis(leaf)),
            "skewness": float(skewness(leaf)),
            "variance": float(variance(leaf)),
            "mean": float(jnp.mean(leaf.astype(jnp.float32))),
        }
    return results


def _path_entry_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "name"):
        return str(p.name)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)
