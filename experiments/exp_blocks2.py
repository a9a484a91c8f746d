import time, jax, jax.numpy as jnp, numpy as np

N = 1 << 24
ks = jax.random.split(jax.random.PRNGKey(1), 8)
A = [jax.random.randint(ks[i], (N,), 0, 1 << 30, dtype=jnp.int32) for i in range(4)]

def bench(name, fn, args_list, iters=6, bytes_per=8):
    o = fn(*args_list[0]); jax.block_until_ready(o)
    # verify result depends on input (anti-DCE): fetch a scalar
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    gbs = N * bytes_per / dt / 1e9
    print(f"{name:24s} {dt*1e3:9.3f} ms  {N/dt/1e9:8.2f} Gelem/s  {gbs:7.1f} GB/s")
    return outs[0]

# baseline: elementwise add (read 2, write 1 -> 12 B/elem)
bench("add", jax.jit(lambda a, b: a + b), [(A[0], A[1]), (A[2], A[3])], bytes_per=12)
# dense reduce over minor dim
bench("min over (N/64,64)", jax.jit(lambda a: jnp.min(a.reshape(-1, 64), axis=1)), [(a,) for a in A], bytes_per=4)
# sort with verification
out = bench("sort", jax.jit(jnp.sort), [(a,) for a in A], iters=3, bytes_per=8)
x = np.asarray(out[::1<<20]); print("   sorted check:", bool((np.diff(x) >= 0).all()))
# cumsum
out = bench("cumsum", jax.jit(jnp.cumsum), [(a,) for a in A], bytes_per=8)
# matmul sanity
M = 4096
B = [jax.random.normal(ks[i], (M, M), jnp.bfloat16) for i in range(2)]
f = jax.jit(lambda a, b: a @ b)
o = f(*B); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(10): o = f(*B)
jax.block_until_ready(o)
dt = (time.perf_counter() - t0) / 10
print(f"matmul {M}^3 bf16: {dt*1e3:.3f} ms -> {2*M**3/dt/1e12:.1f} TFLOP/s")
