"""TPU microbench: dense_from_sorted vs the two set-scatters."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted
from pcrhpg24_tpu.render.raster import EMPTY

N = 4_194_304
SIZE = 1920*1080
rng = np.random.default_rng(0)
pid_np = rng.integers(0, SIZE, N).astype(np.uint32)
pid_np[rng.random(N) < 0.5] = SIZE
spid, sdep, spay = jax.lax.sort(
    [jnp.asarray(pid_np), jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32)),
     jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))], num_keys=3)
spid, sdep, spay = jax.block_until_ready((spid, sdep, spay))

# correctness on TPU first (vs scatter construction)
head = jnp.concatenate([jnp.ones(1, bool), spid[1:] != spid[:-1]]) & (spid < SIZE)
tgt = jnp.where(head, spid, jnp.uint32(SIZE)).astype(jnp.int32)
ref_p = np.asarray(jnp.full((SIZE,), EMPTY, jnp.uint32).at[tgt].set(spay, mode="drop"))
ref_d = np.asarray(jnp.full((SIZE,), EMPTY, jnp.uint32).at[tgt].set(sdep, mode="drop"))
got_d, got_p = dense_from_sorted(spid, sdep, spay, SIZE, True)
print("TPU payload equal:", bool((np.asarray(got_p) == ref_p).all()), flush=True)
print("TPU depth   equal:", bool((np.asarray(got_d) == ref_d).all()), flush=True)

for nd in (False, True):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(spid, sdep, spay, k, nd=nd):
        acc = jnp.uint32(0); p = spid
        for _ in range(k):
            fd, fp = dense_from_sorted(p, sdep, spay, SIZE, nd)
            probe = fp[0]
            p = spid + jnp.where(probe == jnp.uint32(1), 1, 0).astype(jnp.uint32)
            acc += probe
        return acc
    ts = {}
    for k in (1, 5):
        float(chain(spid, sdep, spay, k=k))
        t0 = time.perf_counter(); float(chain(spid, sdep, spay, k=k)); ts[k] = time.perf_counter()-t0
    per = (ts[5]-ts[1])/4
    print(f"dense_from_sorted need_depth={nd}: {per*1e3:7.2f} ms", flush=True)
