"""Run the Pallas tbatch decoder on real TPU: correctness + throughput."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax
import jax.numpy as jnp

from pcrhpg24_tpu.codec.native import decode_native_batch, encode_native_batch
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.render.pallas_decode import decode_native_batches, pack_native_batches

def cloud(seed):
    rng = np.random.default_rng(seed)
    n = 65536
    steps = rng.integers(-80, 80, size=(n, 3))
    pts = np.cumsum(steps, axis=0, dtype=np.int64)
    pts = ((pts + 2**31) % 2**32 - 2**31).astype(np.int32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    o = morton_order(x, y, z)
    return x[o], y[o], z[o]

print("device:", jax.devices()[0])
clouds = [cloud(s) for s in range(4)]
nbs = [encode_native_batch(x, y, z) for x, y, z in clouds]
packed = pack_native_batches(nbs)
args = [jnp.asarray(packed[k]) for k in ("lj", "streams", "ptrs", "dD", "lut", "starts")]

t0 = time.time()
out = decode_native_batches(*args)
out.block_until_ready()
print(f"compile+run: {time.time()-t0:.1f}s")

ok = True
outn = np.asarray(out)
for b, nb in enumerate(nbs):
    want = decode_native_batch(nb)
    got = np.transpose(outn[b], (2, 3, 0, 1)).reshape(-1, 3)
    if not np.array_equal(got, want):
        bad = (got != want).any(1).sum()
        print(f"batch {b}: MISMATCH {bad} points")
        ok = False
print("bit-exact on TPU:", ok)

# throughput: replicate to more batches
REP = 64
big = {k: np.repeat(packed[k], REP // len(nbs), axis=0) for k in packed}
bargs = [jnp.asarray(big[k]) for k in ("lj", "streams", "ptrs", "dD", "lut", "starts")]
o = decode_native_batches(*bargs); o.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    o = decode_native_batches(*bargs)
    o.block_until_ready()
dt = (time.perf_counter() - t0) / 3
npts = REP * 65536
print(f"decode {npts/1e6:.1f}M pts in {dt*1e3:.2f} ms -> {npts/dt/1e9:.2f} Gpts/s")
