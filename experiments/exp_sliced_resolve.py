"""sorted_scatter_u64_min with internal slicing: find the best slice size."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.render.raster import EMPTY

N = 4_194_304
SIZE = 1920*1080
rng = np.random.default_rng(0)
# realistic: ~half in-bounds, Morton-ish clustering (sorted-ish pids)
pid_np = rng.integers(0, SIZE, N).astype(np.uint32)
pid_np[rng.random(N) < 0.5] = SIZE
pid = jnp.asarray(pid_np.astype(jnp.uint32))
dep = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
pay = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))

def resolve_slice(pid, dep, pay, size, fb_d, fb_p):
    spid, sdep, spay = jax.lax.sort([pid, dep, pay], num_keys=3)
    head = jnp.concatenate([jnp.ones(1, bool), spid[1:] != spid[:-1]]) & (spid < size)
    tgt = jnp.where(head, spid, jnp.uint32(size)).astype(jnp.int32)
    cd = jnp.full((size,), EMPTY, jnp.uint32).at[tgt].set(sdep, mode="drop")
    cp = jnp.full((size,), EMPTY, jnp.uint32).at[tgt].set(spay, mode="drop")
    better = (cd < fb_d) | ((cd == fb_d) & (cp < fb_p))
    return jnp.where(better, cd, fb_d), jnp.where(better, cp, fb_p)

def sliced(pid, dep, pay, size, fb_d, fb_p, S):
    n = pid.shape[0]
    for s in range(0, n, S):
        e = min(n, s + S)
        fb_d, fb_p = resolve_slice(pid[s:e], dep[s:e], pay[s:e], size, fb_d, fb_p)
    return fb_d, fb_p

import os
for S in [int(x) for x in os.environ['SLICES'].split(',')]:
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(pid, dep, pay, k, S=S):
        acc = jnp.uint32(0); p = pid
        for _ in range(k):
            fb_d = jnp.full((SIZE,), EMPTY, jnp.uint32)
            fb_p = jnp.full((SIZE,), EMPTY, jnp.uint32)
            fb_d, fb_p = sliced(p, dep, pay, SIZE, fb_d, fb_p, S)
            probe = fb_p[0]
            p = pid + jnp.where(probe == jnp.uint32(1), 1, 0).astype(jnp.uint32)
            acc += probe
        return acc
    ts = {}
    for k in (1, 3):
        float(chain(pid, dep, pay, k=k))
        t0 = time.perf_counter(); float(chain(pid, dep, pay, k=k)); ts[k] = time.perf_counter()-t0
    per = (ts[3]-ts[1])/2
    print(f"S={S:9d}: {per*1e3:7.2f} ms  ({N/per/1e9:.3f} Gpts/s resolve)", flush=True)

