import time, jax, jax.numpy as jnp, numpy as np

N = 1 << 24
x = jax.random.randint(jax.random.PRNGKey(5), (N,), 0, 1 << 30, dtype=jnp.int32)
xn = np.asarray(x)

f = jax.jit(jnp.sort)
o = f(x); o.block_until_ready()

t0 = time.perf_counter(); o = f(x); o.block_until_ready(); t1 = time.perf_counter()
on = np.asarray(o); t2 = time.perf_counter()
print(f"sort: {1e3*(t1-t0):.3f} ms, fetch: {1e3*(t2-t1):.1f} ms")

t0 = time.perf_counter(); ref = np.sort(xn); t1 = time.perf_counter()
print(f"np.sort: {1e3*(t1-t0):.1f} ms; equal: {np.array_equal(on, ref)}")

g = jax.jit(lambda a: jax.lax.sort([a, a+1], num_keys=1))
o2 = g(x); jax.block_until_ready(o2)
t0 = time.perf_counter(); o2 = g(x); jax.block_until_ready(o2); t1 = time.perf_counter()
print(f"sort_key_val: {1e3*(t1-t0):.3f} ms; equal: {np.array_equal(np.asarray(o2[0]), ref)}")
