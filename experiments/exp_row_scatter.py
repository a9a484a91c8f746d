import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

HW, N = 1 << 21, 1 << 22
idx = jnp.asarray(np.random.default_rng(0).integers(0, HW, N).astype(np.int32))
a = jnp.asarray(np.random.default_rng(1).integers(0, 1 << 30, N).astype(np.uint32))
b = jnp.asarray(np.random.default_rng(2).integers(0, 1 << 24, N).astype(np.uint32))

@functools.partial(jax.jit, static_argnames=("k", "mode"))
def chain(idx, a, b, k, mode):
    acc = jnp.uint32(0)
    a0 = a
    for _ in range(k):
        if mode == "two":
            f1 = jnp.full((HW,), jnp.uint32(0xFFFFFFFF)).at[idx].set(a0, mode="drop")
            f2 = jnp.full((HW,), jnp.uint32(0xFFFFFFFF)).at[idx].set(b, mode="drop")
            probe = f1[0] ^ f2[0]
        else:
            fb2 = jnp.full((HW, 2), jnp.uint32(0xFFFFFFFF))
            upd = jnp.stack([a0, b], axis=1)
            fb2 = fb2.at[idx].set(upd, mode="drop")
            probe = fb2[0, 0] ^ fb2[0, 1]
        a0 = a + jnp.where(probe == jnp.uint32(123), 1, 0).astype(jnp.uint32)
        acc += probe
    return acc

for mode in ("two", "row"):
    ts = {}
    for k in (1, 5):
        o = chain(idx, a, b, k=k, mode=mode); float(o)
        t0 = time.perf_counter(); o = chain(idx, a, b, k=k, mode=mode); float(o)
        ts[k] = time.perf_counter() - t0
    per = (ts[5] - ts[1]) / 4
    print(f"{mode:4s}: {per*1e3:7.2f} ms per {N}x2 values")
