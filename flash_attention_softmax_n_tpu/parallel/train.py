"""Sharded training step: TP ("model") x DP ("data") causal-LM training.

The multi-chip compute path: parameters are tensor-sharded per
sharding.decoder_param_specs, batches are data-sharded, and the step is a
single jit with input/output shardings — XLA's SPMD partitioner inserts the
all-gathers/psums/reduce-scatters over ICI (scaling-book recipe; no
user-space collectives, SURVEY §2.3).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attention_softmax_n_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
)
from flash_attention_softmax_n_tpu.parallel.sharding import (
    decoder_param_specs,
    param_shardings,
    shard_pytree,
    zero1_opt_shardings,
)

__all__ = ["causal_lm_loss", "make_train_step", "TrainState"]


def causal_lm_loss(params: Dict, cfg: DecoderConfig,
                   tokens: jax.Array, *, sp_mesh=None,
                   sp_axis: str = "sp", tp_mesh=None,
                   train: bool = False,
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Next-token cross-entropy over (B, L) tokens (shift-by-one).

    ``sp_mesh``/``sp_axis``: run attention sequence-parallel (ring
    attention over the mesh axis); ``tp_mesh``: shard_map the fused
    Pallas attention over (data, model) — see decoder_forward.

    ``train=True`` + ``dropout_rng``: fine-tuning mode — activates
    ``cfg.attn_dropout`` in the model (the reference keeps its patched
    modules' nn.Dropout live for composer fine-tuning, surgery/_bert.py:102).
    """
    logits = decoder_forward(params, cfg, tokens, sp_mesh=sp_mesh,
                             sp_axis=sp_axis, tp_mesh=tp_mesh,
                             train=train,
                             dropout_rng=dropout_rng)  # (B, L, V)
    targets = tokens[:, 1:]
    logits = logits[:, :-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


class TrainState:
    """Minimal train state: params + optimizer state (pytree container)."""

    def __init__(self, params, opt_state):
        self.params = params
        self.opt_state = opt_state


def make_train_step(cfg: DecoderConfig, mesh: Mesh,
                    learning_rate: float = 1e-4,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    sp_axis: Optional[str] = None,
                    dcn_data_axis: Optional[str] = None,
                    zero1: bool = False):
    """Build (sharded_init, sharded_step) for TP x DP (x SP) training.

    ``sharded_init(params)`` -> (params, opt_state) placed on the mesh.
    ``sharded_step(params, opt_state, tokens)`` -> (params, opt_state, loss),
    jitted with NamedShardings so every weight stays tensor-sharded across
    steps (grads and optimizer moments inherit the param shardings).

    ``sp_axis``: name of a mesh axis to run sequence-parallel — token
    batches shard (batch='data', sequence=sp_axis) and attention runs as
    ring attention over that axis (long-context training; SURVEY §2.3).
    The sequence length must divide by the axis size.

    ``dcn_data_axis``: extra data-parallel mesh axis spanning slices over
    DCN (mesh.make_hybrid_mesh) — batches shard over
    (dcn_data_axis, 'data') jointly; params stay replicated across it, so
    the only DCN traffic is the per-step gradient all-reduce (the >=85%
    host-scaling layout).

    ``zero1``: shard the optimizer moments over the 'data' (ICI) axis on
    top of their TP spec — ZeRO-1 / optimizer-state sharding. Params stay
    DP-replicated; XLA lowers the moment update to
    reduce-scatter(grads) -> sharded Adam -> all-gather(updates), cutting
    optimizer memory per chip by the DP degree with identical numerics.
    (Moments are never sharded over ``dcn_data_axis`` — the per-step
    gather would ride DCN.)
    """
    tx = optimizer or optax.adamw(learning_rate)
    for ax in (sp_axis, dcn_data_axis):
        if ax is not None and ax not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {ax!r}: {mesh.axis_names}")

    def init(params):
        specs = decoder_param_specs(params)
        params = shard_pytree(params, specs, mesh)
        opt_state = tx.init(params)
        if zero1:
            opt_state = jax.device_put(
                opt_state,
                zero1_opt_shardings(opt_state, params, specs, mesh))
        return params, opt_state

    def step(params, opt_state, tokens, dropout_rng=None):
        loss, grads = jax.value_and_grad(causal_lm_loss)(
            params, cfg, tokens,
            sp_mesh=mesh if sp_axis is not None else None,
            sp_axis=sp_axis or "sp",
            # non-SP: partition the fused Pallas attention (if selected)
            # over (data, model) — GSPMD can't split a pallas_call
            tp_mesh=mesh if sp_axis is None else None,
            train=dropout_rng is not None,
            dropout_rng=dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # the jitted step is BUILT ONCE per (eval/train) mode and reused: a
    # fresh jax.jit wrapper per call would re-TRACE the whole
    # remat+scan+shard_map graph every step (~2 s/step measured at L=8k
    # even with all executables compile-cached, r4) — the classic
    # jit-in-the-hot-loop bug, hidden until a caller actually looped
    _jits: dict = {}

    def sharded_step(params, opt_state, tokens, dropout_rng=None):
        """One sharded update. Passing ``dropout_rng`` (a PRNGKey, e.g.
        jax.random.fold_in(base, step)) runs the model in training mode
        with cfg.attn_dropout active — the surgery -> fine-tune workflow;
        omitting it keeps the round-2 eval-mode signature."""
        train_mode = dropout_rng is not None
        if train_mode not in _jits:
            specs = decoder_param_specs(params)
            p_shardings = param_shardings(params, specs, mesh)
            o_shardings = (zero1_opt_shardings(opt_state, params, specs,
                                               mesh) if zero1 else None)
            data_axes = (("data",) if dcn_data_axis is None
                         else (dcn_data_axis, "data"))
            # sp_axis None = seq replicated
            token_sharding = NamedSharding(mesh, P(data_axes, sp_axis))
            in_sh = (p_shardings, o_shardings, token_sharding)
            _jits[train_mode] = jax.jit(
                step,
                in_shardings=in_sh + ((None,) if train_mode else ()),
                out_shardings=(p_shardings, o_shardings, None),
            )
        if train_mode:
            return _jits[True](params, opt_state, tokens, dropout_rng)
        return _jits[False](params, opt_state, tokens)

    return init, sharded_step
