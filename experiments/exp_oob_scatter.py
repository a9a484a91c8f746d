"""set-scatter cost vs in-bounds fraction, and vs physical update count."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

SIZE = 1920*1080
rng = np.random.default_rng(0)

def run(label, n, frac_ib):
    pid_np = np.full(n, SIZE, np.int32)
    k = int(n*frac_ib)
    pid_np[:k] = rng.integers(0, SIZE, k)
    pid = jnp.asarray(pid_np)
    a = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    def f(p, a):
        c = jnp.zeros((SIZE,), jnp.uint32).at[p].set(a, mode="drop")
        return c[0]
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(pid, a, k):
        acc = jnp.uint32(0); p = pid
        for _ in range(k):
            probe = f(p, a)
            p = pid + jnp.where(probe == jnp.uint32(1), 1, 0)
            acc += probe
        return acc
    ts = {}
    for kk in (1, 5):
        float(chain(pid, a, k=kk))
        t0 = time.perf_counter(); float(chain(pid, a, k=kk)); ts[kk] = time.perf_counter()-t0
    per = (ts[5]-ts[1])/4
    print(f"{label:28s}: {per*1e3:7.2f} ms")

run("4.2M all in-bounds", 4_194_304, 1.0)
run("4.2M 25% in-bounds", 4_194_304, 0.25)
run("4.2M  5% in-bounds", 4_194_304, 0.05)
run("4.2M  0% in-bounds", 4_194_304, 0.0)
run("1.05M all in-bounds", 1_048_576, 1.0)
