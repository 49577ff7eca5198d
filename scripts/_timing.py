"""Device-loop timing for relay-attached TPUs.

A per-dispatch host loop measures the ~1.7 ms relay dispatch overhead, not
the kernel (CLAUDE.md gotcha — the round-3 decode/sweep microbenches first
ran that way and reported a 1.5-1.9 ms floor for everything). time_scan
instead runs ``reps`` applications inside ONE jit via lax.scan, chaining
each iteration's output back into one argument so XLA cannot parallelize
or elide them, and divides the wall-clock by reps. Dispatch overhead is
amortized to 1.7ms/reps per application.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax


def sync(x) -> float:
    """Block until x is computed (scalar transfer — the only reliable sync
    primitive over the relay)."""
    return float(jnp.sum(x.astype(jnp.float32)))


def time_scan(fn, *args, chain_arg=0, reps=20, outer=3):
    """Per-application seconds of ``fn(*args)`` timed on device.

    ``fn``'s output is fed back as ``args[chain_arg]`` on every scan step
    (cast/reshaped to match), forcing true serialization of the reps.
    Requires output size == that argument's size.
    """
    args = list(args)
    proto = args[chain_arg]

    def rep(*a):
        a = list(a)

        def step(c, _):
            out = fn(*a[:chain_arg], c, *a[chain_arg + 1:])
            return out.astype(proto.dtype).reshape(proto.shape), None

        c, _ = lax.scan(step, a[chain_arg], None, length=reps)
        return c

    f = jax.jit(rep)
    sync(f(*args))
    sync(f(*args))  # twice: relay relayout warmup
    t0 = time.time()
    out = None
    for _ in range(outer):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / outer / reps


def time_scan_dep(fn, *args, reps=20, outer=3):
    """Like time_scan, for ops whose output shape matches no input: each
    scan step perturbs the first argument by a tiny multiple of one output
    element, forcing a true serial dependency on the whole op (XLA cannot
    split a dot to satisfy a one-element slice). The 1e-30 factor is
    representable in bf16 and not algebraically removable (unlike *0)."""
    args = list(args)
    x0 = args[0]

    def rep(*a):
        def step(x, _):
            out = fn(x, *a[1:])
            dep = jnp.ravel(out)[:1].astype(x.dtype) * x.dtype.type(1e-30)
            return x + dep, None

        x, _ = lax.scan(step, a[0], None, length=reps)
        return x

    f = jax.jit(rep)
    sync(f(*args))
    sync(f(*args))
    t0 = time.time()
    out = None
    for _ in range(outer):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / outer / reps
