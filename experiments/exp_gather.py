import time, functools, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Q: can a pallas TPU kernel gather from a 4096-entry table with per-lane indices?
TAB = 4096

def kern(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]            # (32,128) int32
    idx = idx_ref[:]            # (8,128) int32 in [0,4096)
    flat = tab.reshape(1, TAB)
    out_ref[:] = jnp.take_along_axis(
        jnp.broadcast_to(flat, (idx.shape[0] * idx.shape[1] // TAB if False else 8, TAB)),
        idx.reshape(8, 128), axis=1) if False else flat[0, idx]

@jax.jit
def lookup(tab, idx):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)

tab = jnp.arange(TAB, dtype=jnp.int32).reshape(32, 128) * 7
idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, TAB, dtype=jnp.int32)
try:
    out = lookup(tab, idx)
    ref = (jnp.arange(TAB, dtype=jnp.int32) * 7)[idx.reshape(-1)].reshape(8, 128)
    print("variant flat[0,idx]: works, correct:", bool(jnp.array_equal(out, ref)))
except Exception as e:
    print("variant flat[0,idx] failed:", repr(e)[:300])
