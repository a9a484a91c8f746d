# re-verify the 7 Gpts/s slope with more chain lengths
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import time, functools
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.codec.native import encode_native_batch
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.render.pallas_decode import decode_native_batches, pack_native_batches

rng = np.random.default_rng(0)
n = 65536
steps = rng.integers(-80, 80, size=(n, 3))
pts = np.cumsum(steps, axis=0, dtype=np.int64).astype(np.int32)
x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
o = morton_order(x, y, z)
nb = encode_native_batch(x[o], y[o], z[o])
packed = pack_native_batches([nb])
B = 64
big = {k: np.repeat(packed[k], B, axis=0) for k in packed}
args = [jnp.asarray(big[k]) for k in ("lj", "streams", "ptrs", "dD", "lut", "starts")]

@functools.partial(jax.jit, static_argnames=("k",))
def chain(lj, streams, ptrs, dD, lut, starts, k):
    lj0 = lj
    acc = jnp.int32(0)
    for _ in range(k):
        out = decode_native_batches(lj0, streams, ptrs, dD, lut, starts)
        probe = out[0, 0, 0, 0, 0]
        tok = jnp.where(probe == jnp.int32(-123454321), 1, 0).astype(jnp.int32)
        lj0 = lj + tok
        acc = acc + probe
    return acc

times = {}
for k in (1, 5, 11, 21):
    r = chain(*args, k=k); float(r)
    t0 = time.perf_counter(); r = chain(*args, k=k); float(r)
    times[k] = time.perf_counter() - t0
    print(f"k={k}: {times[k]*1e3:.1f} ms")
for a, b in ((1, 11), (5, 21), (11, 21)):
    per = (times[b] - times[a]) / (b - a)
    print(f"slope {a}->{b}: {per*1e3:.2f} ms/inv -> {B*65536/per/1e9:.2f} Gpts/s")
