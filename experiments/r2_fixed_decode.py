"""fbatch Pallas decode kernel: TPU bit-exactness + slope throughput."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.codec.fixed import encode_fixed_batch, decode_fixed_batch
from pcrhpg24_tpu.render.pallas_decode_fixed import decode_fixed_batches, pack_fixed_batches
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud
from pcrhpg24_tpu.codec.morton import morton_order

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = B * 65536
xyz, _ = terrain_cloud(n, seed=1, extent=2000.0)
g = cloud_to_grid(xyz, scale=(0.001, 0.001, 0.001)).astype(np.int64)
g = g[morton_order(g[:, 0], g[:, 1], g[:, 2])]
fbs = [encode_fixed_batch(*(g[b*65536:(b+1)*65536, i].astype(np.int32) for i in range(3)))
       for b in range(B)]
packed = {k: jnp.asarray(v) for k, v in pack_fixed_batches(fbs).items()}
print("packed words/batch:", packed["streams"].shape, flush=True)

out = decode_fixed_batches(packed["widths"], packed["streams"], packed["ptrs"], packed["starts"])
out = np.asarray(jax.block_until_ready(out))
ref0 = decode_fixed_batch(fbs[0]).reshape(8, 128, 64, 3)
got0 = np.transpose(out[0], (2, 3, 0, 1))
assert np.array_equal(got0, ref0), "TPU decode mismatch!"
print("TPU decode bit-exact on batch 0", flush=True)

@functools.partial(jax.jit, static_argnames=("k",))
def chain(w, s, p, st, k):
    acc = jnp.int32(0)
    for _ in range(k):
        o = decode_fixed_batches(w, s, p, st)
        probe = o[0, 0, 0, 0, 0]
        bump = jnp.where(probe == jnp.int32(123456789), 1, 0)
        st = st + bump
        acc += probe
    return acc

ts = {}
for k in (1, 4):
    float(chain(packed["widths"], packed["streams"], packed["ptrs"], packed["starts"], k=k))
    t0 = time.perf_counter()
    float(chain(packed["widths"], packed["streams"], packed["ptrs"], packed["starts"], k=k))
    ts[k] = time.perf_counter() - t0
dt = (ts[4] - ts[1]) / 3
print(f"decode: {dt*1e3:.2f} ms for {n/1e6:.1f}M pts = {n/dt/1e9:.2f} Gpts/s", flush=True)
