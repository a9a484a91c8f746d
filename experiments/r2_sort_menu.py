"""Round-2 resolve design space: sort variants, batched sorts, seg-scans.

Slope-method timing (k=1 vs k=4 chained, value-dependent) per
experiments/NOTES.md.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

N = 4_194_304
rng = np.random.default_rng(0)
a_h = rng.integers(0, 2**31, N).astype(np.uint32)
b_h = rng.integers(0, 2**31, N).astype(np.uint32)
c_h = rng.integers(0, 2**31, N).astype(np.uint32)
a = jnp.asarray(a_h); b = jnp.asarray(b_h); c = jnp.asarray(c_h)
a64 = jnp.asarray((a_h.astype(np.uint64) << 32) | b_h)
seg = jnp.asarray(rng.random(N) < 0.3)


def segmin_scan(d, p, flags):
    def comb(x, y):
        fd, fp, ff = x
        gd, gp, gf = y
        lt = (gd < fd) | ((gd == fd) & (gp < fp))
        take_g = gf | lt
        return (jnp.where(take_g, gd, fd), jnp.where(take_g, gp, fp), ff | gf)
    od, op, _ = jax.lax.associative_scan(comb, (d, p, flags))
    return od, op


# each case: f(a2, b2, c2, a64_2) -> tuple of outputs; a2.. are perturbed
cases = {
    "flat_nk3_unstable": lambda a, b, c, a64: jax.lax.sort([a, b, c], num_keys=3, is_stable=False),
    "flat_nk2_unstable": lambda a, b, c, a64: jax.lax.sort([a, b, c], num_keys=2, is_stable=False),
    "flat_nk1_3op": lambda a, b, c, a64: jax.lax.sort([a, b, c], num_keys=1, is_stable=False),
    "flat_nk1_1op": lambda a, b, c, a64: (jax.lax.sort([a], num_keys=1, is_stable=False)[0],),
    "u64key_nk1_2op": lambda a, b, c, a64: jax.lax.sort([a64, c], num_keys=1, is_stable=False),
    "u64key_nk2_u64u32": lambda a, b, c, a64: jax.lax.sort([a64, b, c], num_keys=2, is_stable=False),
    "batched_64x64k_nk3": lambda a, b, c, a64: jax.lax.sort(
        [a.reshape(64, 65536), b.reshape(64, 65536), c.reshape(64, 65536)],
        dimension=1, num_keys=3, is_stable=False),
    "batched_64x64k_nk1_1op": lambda a, b, c, a64: (jax.lax.sort(
        [a.reshape(64, 65536)], dimension=1, num_keys=1, is_stable=False)[0],),
    "batched_512x8k_nk3": lambda a, b, c, a64: jax.lax.sort(
        [a.reshape(512, 8192), b.reshape(512, 8192), c.reshape(512, 8192)],
        dimension=1, num_keys=3, is_stable=False),
    "batched_4096x1k_nk3": lambda a, b, c, a64: jax.lax.sort(
        [a.reshape(4096, 1024), b.reshape(4096, 1024), c.reshape(4096, 1024)],
        dimension=1, num_keys=3, is_stable=False),
    "batched_16384x256_nk3": lambda a, b, c, a64: jax.lax.sort(
        [a.reshape(16384, 256), b.reshape(16384, 256), c.reshape(16384, 256)],
        dimension=1, num_keys=3, is_stable=False),
    # segmin_scan via associative_scan: compile did not finish in 25+ min
    # at 4.2M (tuple-carry scan unrolls 22 slice levels) — ruled out; the
    # nk1 merge kernel does the segmented min in-register instead.
    # "segmin_scan": lambda a, b, c, a64: segmin_scan(a, b, seg),
    "sort_16th_nk3": lambda a, b, c, a64: jax.lax.sort(
        [a[: N // 16], b[: N // 16], c[: N // 16]], num_keys=3, is_stable=False),
}

for name, f in cases.items():
    try:
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(a, b, c, a64, k, f=f):
            acc = jnp.uint32(0)
            for _ in range(k):
                outs = f(a, b, c, a64)
                probe = outs[0].reshape(-1)[0].astype(jnp.uint32)
                bump = jnp.where(probe == jnp.uint32(123456789), 1, 0)
                a = a + bump.astype(a.dtype)
                b = b + bump.astype(b.dtype)
                c = c + bump.astype(c.dtype)
                a64 = a64 + bump.astype(a64.dtype)
                acc += probe
            return acc
        ts = {}
        for k in (1, 4):
            float(chain(a, b, c, a64, k=k))
            t0 = time.perf_counter(); float(chain(a, b, c, a64, k=k))
            ts[k] = time.perf_counter() - t0
        print(f"{name:24s}: {(ts[4]-ts[1])/3*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:24s}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
