"""MXU ceiling probe: why does a raw dot cap at ~30% of nominal peak?

Round-2 VERDICT weak #6: the prefill kernel's %-of-SOL is quoted against a
nominal bf16 peak the chip never reaches — the round-2 calibration put a
raw jnp.dot at ~30% of nominal. This sweep isolates WHICH factor sets the
real ceiling: problem size (pipeline depth), aspect ratio, dtype/cast
placement, batching (one big dot vs many small), accumulation dtype, and
transpose orientation. The winner defines the ACHIEVABLE peak that kernel
%SOL lines should be calibrated against (bench.py logs that line each run).

Usage: timeout 1500 python scripts/probe_mxu.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


from scripts._timing import time_scan_dep


def bench(fn, *args, reps=20):
    # device-side scan with a one-element output dependency: host-loop
    # timing here measured the ~1.7ms dispatch floor at every small shape
    return time_scan_dep(fn, *args, reps=reps, outer=3)


def tf(m, k, n, dt, batch=1):
    return 2 * batch * m * k * n / dt / 1e12


def run(label, m, k, n, *, dtype=jnp.bfloat16, batch=1, acc=jnp.float32,
        reps=20):
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    shape_a = (batch, m, k) if batch > 1 else (m, k)
    shape_b = (batch, k, n) if batch > 1 else (k, n)
    a = jax.random.normal(ka, shape_a, jnp.float32).astype(dtype)
    b = jax.random.normal(kb, shape_b, jnp.float32).astype(dtype)

    if batch > 1:
        f = jax.jit(lambda a, b: jnp.einsum(
            "bmk,bkn->bmn", a, b, preferred_element_type=acc))
    else:
        f = jax.jit(lambda a, b: jax.lax.dot(
            a, b, preferred_element_type=acc))
    try:
        dt = bench(f, a, b, reps=reps)
        print(f"{label:44s} {tf(m, k, n, dt, batch):7.1f} TF/s "
              f"({dt*1e3:7.3f} ms)", flush=True)
        return tf(m, k, n, dt, batch)
    except Exception as e:
        print(f"{label:44s} FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)

    print("\n-- size scaling (square bf16->f32) --", flush=True)
    best = 0.0
    for s in (512, 1024, 2048, 4096, 8192):
        r = run(f"square {s}^3", s, s, s)
        best = max(best, r or 0.0)

    print("\n-- accumulation dtype at 4096^3 --", flush=True)
    run("acc f32", 4096, 4096, 4096, acc=jnp.float32)
    run("acc bf16", 4096, 4096, 4096, acc=jnp.bfloat16)

    print("\n-- aspect ratios (serving shapes) --", flush=True)
    for m, k, n in ((256, 2048, 5632), (256, 2048, 32000),
                    (2048, 2048, 2048), (8192, 2048, 2048),
                    (256, 2048, 2048), (64, 2048, 5632)):
        run(f"m{m} k{k} n{n}", m, k, n)

    print("\n-- batched small dots (attention-like) --", flush=True)
    for batch, m, k, n in ((32, 1024, 64, 1024), (32, 1024, 1024, 64),
                           (128, 512, 64, 512), (8, 2048, 128, 2048)):
        run(f"bmm b{batch} m{m} k{k} n{n}", m, k, n, batch=batch)

    print("\n-- dtype in (cast cost folded?) --", flush=True)
    run("f32 in, f32 acc 2048^3", 2048, 2048, 2048, dtype=jnp.float32)
    run("bf16 in 2048^3", 2048, 2048, 2048)
    run("int8 in, f32 acc 2048^3 (XLA picks path)", 2048, 2048, 2048,
        dtype=jnp.int8, acc=jnp.float32)

    print(f"\nACHIEVABLE bf16 peak on this chip: ~{best:.0f} TF/s "
          "(calibrate kernel %SOL against this, not nominal)", flush=True)


if __name__ == "__main__":
    main()
