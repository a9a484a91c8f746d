import time, jax, jax.numpy as jnp, numpy as np

N = 1 << 24
HW = 1080 * 1920
ks = jax.random.split(jax.random.PRNGKey(0), 16)
def fresh(i, hi=1 << 30):
    return jax.random.randint(ks[i], (N,), 0, hi, dtype=jnp.int32)

def bench(name, fn, *arg_sets, iters=4):
    outs = fn(*arg_sets[0])
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    rs = []
    for i in range(iters):
        rs.append(fn(*arg_sets[i % len(arg_sets)]))
    jax.block_until_ready(rs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.3f} ms   {N/dt/1e9:8.2f} Gelem/s")

A = [ (fresh(0),), (fresh(1),), (fresh(2),), (fresh(3),) ]
bench("sort u32", jax.jit(jnp.sort), *A)
bench("cumsum", jax.jit(jnp.cumsum), *A)

pix = [ (jax.random.randint(ks[i], (N,), 0, HW, dtype=jnp.int32),) for i in range(4) ]
fbv = jnp.arange(HW, dtype=jnp.int32)
bench("gather fb[idx] random", jax.jit(lambda i: fbv[i]), *pix)

kv = [ (pix[i][0], fresh(i + 4)) for i in range(4) ]
bench("sort_key_val", jax.jit(lambda k, v: jax.lax.sort([k, v], num_keys=1)), *kv)

bench("seg_min seg=64", jax.jit(lambda v: jnp.min(v.reshape(-1, 64), axis=1)), *A)

# scatter unique: permutation scatter
perm = [ (jax.random.permutation(ks[i], N).astype(jnp.int32), fresh(i+4)) for i in range(2) ]
bench("scatter unique set", jax.jit(lambda p, v: jnp.zeros((N,), jnp.int32).at[p].set(v, unique_indices=True, mode='promise_in_bounds')), *perm, iters=2)
bench("scatter_min HW", jax.jit(lambda i, v: jnp.full((HW,), 2**31 - 1, jnp.int32).at[i].min(v, mode='drop')), *kv, iters=2)
