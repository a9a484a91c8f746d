import time, jax, jax.numpy as jnp, numpy as np

d = jax.devices()[0]
print("device:", d, d.platform, d.device_kind, getattr(d, 'memory_stats', lambda: {})() and {k:v//2**20 for k,v in d.memory_stats().items() if 'bytes_limit' in k})

N = 1 << 24
x0 = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30, dtype=jnp.int32)

# chained adds: 100 sequential passes over 16M -> forces real bandwidth
@jax.jit
def chain_add(x):
    def body(i, x):
        return x + i
    return jax.lax.fori_loop(0, 100, body, x)
o = chain_add(x0); o.block_until_ready()
t0 = time.perf_counter(); o = chain_add(x0); o.block_until_ready()
dt = time.perf_counter() - t0
print(f"chain_add 100x16M: {dt*1e3:.2f} ms -> {100*N*8/dt/1e9:.0f} GB/s effective")

# chained sort: 5 dependent sorts (perturb between)
@jax.jit
def chain_sort(x):
    for i in range(5):
        x = jnp.sort(x ^ (x >> 13) ^ i)
    return x
o = chain_sort(x0); o.block_until_ready()
t0 = time.perf_counter(); o = chain_sort(x0); o.block_until_ready()
dt = time.perf_counter() - t0
print(f"chain_sort 5x16M: {dt*1e3:.2f} ms -> {5*N/dt/1e9:.2f} Gelem/s per sort pass")
x = np.asarray(o[::1<<20]); print("sorted:", bool((np.diff(x)>=0).all()))

# chained scatter_min (dependent)
HW = 1080*1920
idx = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, HW, dtype=jnp.int32)
@jax.jit
def chain_scatter(idx, v):
    fb = jnp.full((HW,), 2**31 - 1, jnp.int32)
    for i in range(3):
        fb = fb.at[idx].min(v + i, mode='drop')
    return fb
o = chain_scatter(idx, x0); o.block_until_ready()
t0 = time.perf_counter(); o = chain_scatter(idx, x0); o.block_until_ready()
dt = time.perf_counter() - t0
print(f"chain_scatter 3x16M: {dt*1e3:.2f} ms -> {3*N/dt/1e9:.2f} Gelem/s per pass")
