import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
N = 4_194_304
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
b = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
c = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
cases = {
    "3ops_nk2": lambda a,b,c: jax.lax.sort([a,b,c], num_keys=2),
    "3ops_nk2_unstable": lambda a,b,c: jax.lax.sort([a,b,c], num_keys=2, is_stable=False),
    "3ops_nk3_unstable": lambda a,b,c: jax.lax.sort([a,b,c], num_keys=3, is_stable=False),
}
for name, f in cases.items():
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a,b,c,k,f=f):
        acc = jnp.uint32(0); x = a
        for _ in range(k):
            outs = f(x,b,c)
            probe = outs[0][0].astype(jnp.uint32)
            x = a + jnp.where(probe == jnp.uint32(1), 1, 0).astype(a.dtype)
            acc += probe
        return acc
    ts = {}
    for k in (1, 4):
        float(chain(a,b,c,k=k))
        t0 = time.perf_counter(); float(chain(a,b,c,k=k)); ts[k] = time.perf_counter()-t0
    print(f"{name:18s}: {(ts[4]-ts[1])/3*1e3:7.2f} ms", flush=True)
