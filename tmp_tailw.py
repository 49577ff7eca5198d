import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
NL, B, KVH, W, HD, REP = 16, 32, 16, 64, 128, 20

def _kern(i_ref, new_ref, t_in, t_out):
    i = i_ref[0]
    row = i - (i // 8) * 8
    sel = jax.lax.broadcasted_iota(jnp.int32, t_in.shape, 3) == row
    t_out[...] = jnp.where(sel, new_ref[...], t_in[...])

def tail_write(tail, new, i):
    nl, b, kvh, w, hd = tail.shape
    spec = pl.BlockSpec((1, b, kvh, 8, hd), lambda g, idx: (g, 0, 0, idx[0] // 8, 0))
    nspec = pl.BlockSpec((1, b, kvh, 1, hd), lambda g, idx: (g, 0, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nl,),
        in_specs=[nspec, spec], out_specs=spec)
    return pl.pallas_call(
        _kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(tail.shape, tail.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(i, new, tail)

tail = jnp.zeros((NL, B, KVH, W, HD), jnp.bfloat16)
new = jax.random.normal(jax.random.PRNGKey(0), (NL, B, KVH, 1, HD), jnp.bfloat16)

@jax.jit
def loop(tail, new):
    def step(t, i):
        return tail_write(t, new, i.reshape(1)), None
    t, _ = jax.lax.scan(step, tail, jnp.arange(REP, dtype=jnp.int32))
    return t

t1 = jax.jit(lambda t, n: tail_write(t, n, jnp.asarray([3], jnp.int32)))(tail, new)
ok = bool(jnp.allclose(t1[:, :, :, 3, :], new[:, :, :, 0, :]))
tot = bool(abs(float(jnp.sum(jnp.abs(t1.astype(jnp.float32)))) - float(jnp.sum(jnp.abs(new.astype(jnp.float32))))) < 1.0)
print("correct:", ok, tot, flush=True)
for _ in range(2):
    out = loop(tail, new); float(jnp.sum(out.astype(jnp.float32)))
t0 = time.time()
for _ in range(10): out = loop(tail, new)
float(jnp.sum(out.astype(jnp.float32)))
print(f"pallas aliased shared-index tail write b=32: {(time.time()-t0)/10/REP*1e3:.3f} ms/step", flush=True)
