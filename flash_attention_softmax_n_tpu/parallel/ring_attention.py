"""Ring attention: sequence-parallel softmax-N attention over a mesh axis.

Long-context capability (SURVEY §2.3, §5): Q/K/V are sharded along the
sequence axis over the "sp" mesh axis; K/V blocks rotate around the ring via
``ppermute`` while every device folds each visiting block into its local
online-softmax state — the same associative (m, l, acc) merge the Pallas
kernel uses across KV tiles (kernels/flash_attention.py), lifted across
devices.

The ``+n`` term placement (the invariant SURVEY §7 calls the hard part): the
per-block partials are computed with **n = 0** (pure softmax-0 statistics)
and each block returns its output and logsumexp; the ``+n`` enters exactly
once, in the final combine on the device that owns the query row:

    denom = n + sum_blocks exp(lse_b)
    out   = sum_blocks o_b * exp(lse_b) / denom

Causality across the ring: device q_rank attends kv block b fully when
b < q_rank, partially (local causal mask) when b == q_rank, not at all when
b > q_rank (the partial is computed and masked to zero weight — uniform
control flow keeps the ring in lockstep).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["ring_attention_n"]

NEG_INF = -1e30


def _local_attention_block(q, k, v, scale, mode, implementation):
    """softmax-0 partial attention of local q against one visiting kv block.

    mode: 0 = full (block strictly in the past), 1 = diagonal (causal
    within block), 2 = skip (block strictly in the future).
    Returns (o, lse) with lse = log(sum_j exp(s_j)) (n=0 statistics).

    ``mode`` is a traced per-device scalar, so the three cases go through
    ``lax.switch``: every device runs the same *program* (the ring stays
    in lockstep — no collectives live inside the branches) but executes
    only its own branch, so a causal ring does 1 diagonal + past-only full
    blocks instead of computing full AND diagonal attention at every step
    (which doubled the ring's FLOPs).
    """

    def _attend(is_causal):
        def branch(q, k, v):
            s = jnp.einsum("bhle,bhse->bhls", q, k,
                           preferred_element_type=jnp.float32) * scale
            if is_causal:
                lq, lk = q.shape[2], k.shape[2]
                causal = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
                s = jnp.where(causal, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.einsum("bhls,bhsv->bhlv", (e / l).astype(v.dtype), v)
            # all switch branches must agree on output avals exactly
            return o.astype(q.dtype), (m + jnp.log(l))[..., 0]
        return branch

    def _skip(q, k, v):
        # constants must still be typed device-varying over the ring axis
        # so all switch branches agree on vma types
        o = jnp.zeros(q.shape[:3] + (v.shape[-1],), q.dtype)
        lse = jnp.full(q.shape[:3], NEG_INF, jnp.float32)
        vma = getattr(jax.typeof(q), "vma", None)
        if vma:
            o = jax.lax.pcast(o, tuple(vma), to="varying")
            lse = jax.lax.pcast(lse, tuple(vma), to="varying")
        return o, lse

    return jax.lax.switch(mode, [_attend(False), _attend(True), _skip],
                          q, k, v)


def ring_attention_n(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str = "sp",
    softmax_n_param: float = 0.0,
    scale: Optional[float] = None,
    is_causal: bool = True,
    implementation: str = "auto",
) -> jax.Array:
    """Sequence-parallel softmax-N attention.

    q/k/v (B, H, L, E) logically; physically sharded (B, H, L/p, E) over
    ``axis_name``. Returns the attention output with the same sharding as q.

    The per-block attention is the XLA formulation on every backend
    (``implementation`` is accepted for API stability and ignored): each
    block is a local (L/p, L/p) problem that XLA fuses well, and — unlike
    routing blocks through the Pallas kernel's ``return_residuals`` path —
    it is exactly differentiable end to end: the ring combine depends on
    each block's logsumexp, whose cotangent the kernel's custom VJP treats
    as a non-differentiable auxiliary (and pallas_call outputs currently
    lack the vma typing shard_map's checker requires). A ring-aware kernel
    VJP (per-block flash backward against the saved GLOBAL lse, rotating
    dk/dv with the blocks) is the designed path to long-context blocks
    that don't fit the (L/p)^2 materialization.
    """
    del implementation
    if scale is None:
        scale = q.shape[-1] ** -0.5
    implementation = "xla"

    def local_fn(q, k, v):
        p = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)

        def step(carry, t):
            # running state is the kernel's (un-normalized acc, max, sum):
            #   o_tilde = sum_seen exp(s - m) v;  l = sum_seen exp(s - m)
            o_tilde, m, l, k_cur, v_cur = carry
            # at step t this device holds kv block (my - t) mod p
            block_owner = jax.lax.rem(my - t + p, p)
            if is_causal:
                mode = jnp.where(block_owner < my, 0,
                                 jnp.where(block_owner == my, 1, 2))
            else:
                mode = jnp.zeros((), jnp.int32)
            o_b, lse_b = _local_attention_block(
                q, k_cur, v_cur, scale, mode, implementation)

            # fold: block contributes exp(lse_b - m_new) * o_b (o_b is the
            # block-normalized output, so o_b * exp(lse_b) is its raw sum)
            m_new = jnp.maximum(m, lse_b)
            m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
            alpha = jnp.exp(m - m_safe)
            alpha = jnp.where(m <= NEG_INF / 2, 0.0, alpha)
            w_b = jnp.exp(lse_b - m_safe)
            w_b = jnp.where(lse_b <= NEG_INF / 2, 0.0, w_b)
            o_tilde = o_tilde * alpha[..., None] \
                + o_b.astype(jnp.float32) * w_b[..., None]
            l = l * alpha + w_b
            m = m_new

            # rotate kv to the right neighbor
            perm = [(i, (i + 1) % p) for i in range(p)]
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
            return (o_tilde, m, l, k_nxt, v_nxt), None

        b, h, lq, e = q.shape
        # mark initial carries as device-varying over the ring axis (shard_map
        # vma typing: the loop outputs vary across 'sp', so inputs must too)
        o_tilde = jax.lax.pcast(jnp.zeros((b, h, lq, e), jnp.float32),
                                (axis_name,), to='varying')
        m = jax.lax.pcast(jnp.full((b, h, lq), NEG_INF, jnp.float32),
                          (axis_name,), to='varying')
        l = jax.lax.pcast(jnp.zeros((b, h, lq), jnp.float32),
                          (axis_name,), to='varying')
        (o_tilde, m, l, _, _), _ = jax.lax.scan(
            step, (o_tilde, m, l, k, v), jnp.arange(p))

        # final normalization — the +n enters exactly once, here, in the
        # same numeraire as the running max: denom = l + n * exp(-m)
        n_term = softmax_n_param * jnp.exp(jnp.minimum(-m, 80.0))
        denom = l + n_term
        safe = jnp.where(denom == 0.0, 1.0, denom)
        empty = l == 0.0
        out = jnp.where(empty[..., None] & (softmax_n_param > 0),
                        0.0, o_tilde / safe[..., None])
        return out.astype(q.dtype)

    spec = P(None, None, axis_name, None)
    # only the ring axis goes manual; any other mesh axes (data/model in a
    # combined TP x DP x SP train step) stay under GSPMD control, so batch
    # and head shardings pass through untouched instead of being gathered
    return shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        axis_names=frozenset({axis_name}),
    )(q, k, v)
