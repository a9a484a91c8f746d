import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

N = 1 << 22
val = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
for HW in (1 << 14, 1 << 17, 1 << 21):
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, HW, dtype=jnp.int32)
    @functools.partial(jax.jit, static_argnames=("k", "hw"))
    def chain(idx, val, k, hw):
        acc = jnp.uint32(0)
        v0 = val
        for _ in range(k):
            fb = jnp.full((hw,), jnp.uint32(0xFFFFFFFF)).at[idx].min(v0, mode="drop")
            probe = fb[0]
            v0 = val + jnp.where(probe == jnp.uint32(123), 1, 0).astype(jnp.uint32)
            acc += probe
        return acc
    ts = {}
    for k in (1, 5):
        o = chain(idx, val, k=k, hw=HW); float(o)
        t0 = time.perf_counter(); o = chain(idx, val, k=k, hw=HW); float(o)
        ts[k] = time.perf_counter() - t0
    per = (ts[5] - ts[1]) / 4
    print(f"fb={HW:8d}: {per*1e3:7.2f} ms per {N}-update scatter -> {N/per/1e9:.3f} G/s")
