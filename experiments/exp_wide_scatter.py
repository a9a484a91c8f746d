"""Is XLA scatter serialized per-index or per-scalar? Compare:
   A) two u32 set-scatters (current)
   B) one (N,2)->(size,2) set-scatter
   C) one (N,4)->(size,4) set-scatter (padded) — window-size scaling
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

N = 4_194_304
SIZE = 1920*1080
rng = np.random.default_rng(0)
pid = jnp.asarray(rng.integers(0, SIZE, N).astype(np.int32))
a = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
b = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))

def two(pid, a, b):
    ca = jnp.zeros((SIZE,), jnp.uint32).at[pid].set(a, mode="drop")
    cb = jnp.zeros((SIZE,), jnp.uint32).at[pid].set(b, mode="drop")
    return ca[0] + cb[0]

def wide2(pid, a, b):
    upd = jnp.stack([a, b], axis=1)
    c = jnp.zeros((SIZE, 2), jnp.uint32).at[pid].set(upd, mode="drop")
    return c[0, 0] + c[0, 1]

def wide4(pid, a, b):
    upd = jnp.stack([a, b, a, b], axis=1)
    c = jnp.zeros((SIZE, 4), jnp.uint32).at[pid].set(upd, mode="drop")
    return c[0, 0] + c[0, 1]

for name, f in (("two_u32", two), ("wide2", wide2), ("wide4", wide4)):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(pid, a, b, k, f=f):
        acc = jnp.uint32(0)
        p = pid
        for _ in range(k):
            probe = f(p, a, b)
            p = pid + jnp.where(probe == jnp.uint32(1), 1, 0)
            acc += probe
        return acc
    ts = {}
    for k in (1, 5):
        o = chain(pid, a, b, k=k); float(o)
        t0 = time.perf_counter(); float(chain(pid, a, b, k=k)); ts[k] = time.perf_counter() - t0
    per = (ts[5]-ts[1])/4
    print(f"{name:8s}: {per*1e3:7.2f} ms  ({N/per/1e9:.3f} G-updates/s)")
