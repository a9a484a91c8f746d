import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

N, HW = 1 << 22, 1080 * 1920
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
idx = jax.random.randint(k1, (N,), 0, HW, dtype=jnp.int32)
val = jax.random.randint(k2, (N,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)

@functools.partial(jax.jit, static_argnames=("k", "frac_oob"))
def chain(idx, val, k, frac_oob):
    n_oob = int(N * frac_oob)
    idx2 = jnp.where(jnp.arange(N) < n_oob, HW, idx)
    acc = jnp.uint32(0)
    v0 = val
    for _ in range(k):
        fb = jnp.full((HW,), jnp.uint32(0xFFFFFFFF)).at[idx2].min(v0, mode="drop")
        probe = fb[0]
        v0 = val + jnp.where(probe == jnp.uint32(123), 1, 0).astype(jnp.uint32)
        acc += probe
    return acc

for frac in (0.0, 0.5, 0.9):
    ts = {}
    for k in (1, 5):
        o = chain(idx, val, k=k, frac_oob=frac); float(o)
        t0 = time.perf_counter(); o = chain(idx, val, k=k, frac_oob=frac); float(o)
        ts[k] = time.perf_counter() - t0
    per = (ts[5] - ts[1]) / 4
    print(f"oob={frac:.1f}: {per*1e3:7.2f} ms per scatter of {N} -> {N/per/1e9:.3f} G/s")
