import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import time, functools
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.render.pallas_raster import tile_sort3

rng = np.random.default_rng(0)
T = 64
pid = rng.integers(0, 500, (T, 8, 128)).astype(np.int32)   # heavy collisions
dep = rng.integers(0, 1 << 30, (T, 8, 128)).astype(np.int32)
pay = rng.integers(0, 1 << 24, (T, 8, 128)).astype(np.int32)

o0, o1, o2 = (np.asarray(o) for o in tile_sort3(*map(jnp.asarray, (pid, dep, pay))))
ok = True
for t in range(T):
    trip = np.stack([pid[t].reshape(-1), dep[t].reshape(-1), pay[t].reshape(-1)], 1)
    want = trip[np.lexsort((trip[:, 2], trip[:, 1], trip[:, 0]))]
    got = np.stack([o0[t].reshape(-1), o1[t].reshape(-1), o2[t].reshape(-1)], 1)
    if not np.array_equal(got, want):
        print(f"tile {t} MISMATCH"); ok = False; break
print("sort correct:", ok)

# slope throughput
@functools.partial(jax.jit, static_argnames=("k",))
def chain(a, b, c, k):
    acc = jnp.int32(0)
    a0 = a
    for _ in range(k):
        o0, o1, o2 = tile_sort3(a0, b, c)
        probe = o0[0, 0, 0]
        a0 = a + jnp.where(probe == jnp.int32(-9999), 1, 0)
        acc += probe
    return acc
args = tuple(map(jnp.asarray, (pid, dep, pay)))
ts = {}
for k in (1, 9):
    o = chain(*args, k=k); float(o)
    t0 = time.perf_counter(); o = chain(*args, k=k); float(o)
    ts[k] = time.perf_counter() - t0
per = (ts[9] - ts[1]) / 8
n = T * 1024
print(f"tile sort3: {per*1e3:.2f} ms per {n} -> {n/per/1e9:.2f} Gelem/s")
