import time, jax, jax.numpy as jnp

H, W = 1080, 1920
N = 1 << 24  # 16.7M points

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
idx = jax.random.randint(k1, (N,), 0, H * W, dtype=jnp.int32)
val = jax.random.randint(k2, (N,), 0, 1 << 30, dtype=jnp.int32)

@jax.jit
def scatter_min(idx, val):
    fb = jnp.full((H * W,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return fb.at[idx].min(val, mode='drop')

out = scatter_min(idx, val); out.block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    out = scatter_min(idx, val)
out.block_until_ready()
dt = (time.perf_counter() - t0) / 5
print(f"scatter_min: {dt*1e3:.2f} ms for {N} pts -> {N/dt/1e9:.3f} Gpts/s")

# sort-based alternative: sort by pixel then segment-head scatter w/ unique indices
@jax.jit
def sort_raster(idx, val):
    key = (idx.astype(jnp.int64) << 31) | val.astype(jnp.int64)
    skey = jnp.sort(key)
    spix = (skey >> 31).astype(jnp.int32)
    sval = (skey & ((1 << 31) - 1)).astype(jnp.int32)
    head = jnp.concatenate([jnp.array([True]), spix[1:] != spix[:-1]])
    fb = jnp.full((H * W,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return fb.at[jnp.where(head, spix, H * W)].min(sval, mode='drop')

try:
    out2 = sort_raster(idx, val); out2.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out2 = sort_raster(idx, val)
    out2.block_until_ready()
    dt = (time.perf_counter() - t0) / 3
    print(f"sort_raster: {dt*1e3:.2f} ms -> {N/dt/1e9:.3f} Gpts/s")
    print("match:", bool(jnp.array_equal(out, out2)))
except Exception as e:
    print("sort_raster failed:", repr(e)[:200])
