import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
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

for B in (16, 64, 256):
    big = {k: np.repeat(packed[k], B, axis=0) for k in packed}
    args = [jnp.asarray(big[k]) for k in ("lj", "streams", "ptrs", "dD", "lut", "starts")]
    out = decode_native_batches(*args); out.block_until_ready()
    # timing with scalar fetch forcing completion
    t0 = time.perf_counter()
    for _ in range(3):
        out = decode_native_batches(*args)
        s = float(out[0, 0, 0, 0, 0])  # forces device completion + tiny fetch
    dt = (time.perf_counter() - t0) / 3
    npnts = B * 65536
    print(f"B={B:4d}: {dt*1e3:8.2f} ms -> {npnts/dt/1e9:6.2f} Gpts/s (fetch-forced)")
