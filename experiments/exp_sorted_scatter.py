import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

HW = 1 << 21
N = 1 << 21  # sorted unique indices covering most of fb
idx = jnp.asarray(np.sort(np.random.default_rng(0).choice(HW, N, replace=False)).astype(np.int32))
val = jnp.asarray(np.random.default_rng(1).integers(0, 1 << 30, N).astype(np.uint32))

variants = {
    "plain set": dict(),
    "sorted+unique set": dict(unique_indices=True, indices_are_sorted=True),
}
for name, kw in variants.items():
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(idx, val, k, kw=tuple(kw.items())):
        acc = jnp.uint32(0)
        v0 = val
        for _ in range(k):
            fb = jnp.full((HW,), jnp.uint32(0xFFFFFFFF)).at[idx].set(v0, mode="drop", **dict(kw))
            probe = fb[0]
            v0 = val + jnp.where(probe == jnp.uint32(123), 1, 0).astype(jnp.uint32)
            acc += probe
        return acc
    ts = {}
    for k in (1, 5):
        o = chain(idx, val, k=k); float(o)
        t0 = time.perf_counter(); o = chain(idx, val, k=k); float(o)
        ts[k] = time.perf_counter() - t0
    per = (ts[5] - ts[1]) / 4
    print(f"{name:22s}: {per*1e3:7.2f} ms per {N} -> {N/per/1e9:.3f} G/s")

# also: lax.sort of 3 u32 operands, 4.2M
N2 = 1 << 22
a = jnp.asarray(np.random.default_rng(2).integers(0, HW, N2).astype(np.uint32))
b = jnp.asarray(np.random.default_rng(3).integers(0, 1 << 30, N2).astype(np.uint32))
c = jnp.asarray(np.random.default_rng(4).integers(0, 1 << 24, N2).astype(np.uint32))
@functools.partial(jax.jit, static_argnames=("k",))
def chain_sort(a, b, c, k):
    acc = jnp.uint32(0)
    a0 = a
    for _ in range(k):
        sa, sb, sc = jax.lax.sort([a0, b, c], num_keys=3)
        probe = sa[0]
        a0 = a + jnp.where(probe == jnp.uint32(999999999), 1, 0).astype(jnp.uint32)
        acc += probe
    return acc
ts = {}
for k in (1, 4):
    o = chain_sort(a, b, c, k=k); float(o)
    t0 = time.perf_counter(); o = chain_sort(a, b, c, k=k); float(o)
    ts[k] = time.perf_counter() - t0
per = (ts[4] - ts[1]) / 3
print(f"lax.sort 3-key {N2}: {per*1e3:.1f} ms -> {N2/per/1e9:.3f} G/s")
