import time, jax, jax.numpy as jnp, numpy as np

H, W = 1080, 1920
N = 1 << 24

ks = jax.random.split(jax.random.PRNGKey(0), 12)
idxs = [jax.random.randint(ks[i], (N,), 0, H * W, dtype=jnp.int32) for i in range(0, 12, 2)]
vals = [jax.random.randint(ks[i+1], (N,), 0, 1 << 30, dtype=jnp.int32) for i in range(0, 12, 2)]

@jax.jit
def scatter_min(idx, val):
    fb = jnp.full((H * W,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return fb.at[idx].min(val, mode='drop')

out = scatter_min(idxs[0], vals[0]); out.block_until_ready()

# correctness vs numpy
i0 = np.asarray(idxs[0]); v0 = np.asarray(vals[0])
fb = np.full(H * W, np.iinfo(np.int32).max, np.int32)
np.minimum.at(fb, i0, v0)
print("correct:", np.array_equal(fb, np.asarray(out)))

t0 = time.perf_counter()
outs = [scatter_min(idxs[i], vals[i]) for i in range(6)]
for o in outs: o.block_until_ready()
dt = (time.perf_counter() - t0) / 6
print(f"scatter_min: {dt*1e3:.3f} ms -> {N/dt/1e9:.2f} Gpts/s")
