"""Decompose resolve_slice at 1M and 4.2M: sort / scatters / merge."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.render.raster import EMPTY

SIZE = 1920*1080
rng = np.random.default_rng(0)

def mk(n):
    pid_np = rng.integers(0, SIZE, n).astype(np.uint32)
    pid_np[rng.random(n) < 0.5] = SIZE
    return (jnp.asarray(pid_np), jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32)),
            jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32)))

def stage_fn(stage):
    def f(pid, dep, pay):
        spid, sdep, spay = jax.lax.sort([pid, dep, pay], num_keys=3)
        if stage == "sort":
            return spid[0] + sdep[0] + spay[0]
        head = jnp.concatenate([jnp.ones(1, bool), spid[1:] != spid[:-1]]) & (spid < SIZE)
        tgt = jnp.where(head, spid, jnp.uint32(SIZE)).astype(jnp.int32)
        cd = jnp.full((SIZE,), EMPTY, jnp.uint32).at[tgt].set(sdep, mode="drop")
        if stage == "scatter1":
            return cd[0]
        cp = jnp.full((SIZE,), EMPTY, jnp.uint32).at[tgt].set(spay, mode="drop")
        return cd[0] + cp[0]
    return f

for n in (1_048_576, 4_194_304):
    pid, dep, pay = mk(n)
    for stage in ("sort", "scatter1", "scatter2"):
        f = stage_fn(stage)
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(pid, dep, pay, k, f=f):
            acc = jnp.uint32(0); p = pid
            for _ in range(k):
                probe = f(p, dep, pay)
                p = pid + jnp.where(probe == jnp.uint32(1), 1, 0).astype(jnp.uint32)
                acc += probe
            return acc
        ts = {}
        for k in (1, 3):
            float(chain(pid, dep, pay, k=k))
            t0 = time.perf_counter(); float(chain(pid, dep, pay, k=k)); ts[k] = time.perf_counter()-t0
        per = (ts[3]-ts[1])/2
        print(f"n={n:8d} through {stage:8s}: {per*1e3:7.2f} ms", flush=True)
