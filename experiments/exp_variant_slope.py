import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import time, functools
import numpy as np, jax, jax.numpy as jnp
from experiments.exp_pallas_variants import mk_kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pcrhpg24_tpu.codec.native import encode_native_batch
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.render.pallas_decode import pack_native_batches

G, LANES, PPT = 8, 128, 64

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
maxw = big["streams"].shape[2]
args = [jnp.asarray(big[k]) for k in ("lj", "streams", "ptrs", "dD", "lut", "starts")]

def make_fn(variant):
    f = pl.pallas_call(
        mk_kernel(variant),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, maxw), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 384, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM if variant.get("ptr_smem") else pltpu.ANY)
            if variant.get("ptr_smem") else
            pl.BlockSpec((1, 384, G), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 3, G, LANES), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PPT, 3, G, LANES), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, PPT, 3, G, LANES), jnp.int32),
    )
    return f

def slope(fn, label):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(lj, streams, ptrs, dD, lut, starts, k):
        lj0 = lj
        acc = jnp.int32(0)
        for _ in range(k):
            out = fn(lj0, streams, ptrs, dD, lut, starts)
            probe = out[0, 0, 0, 0, 0]
            tok = jnp.where(probe == jnp.int32(-123454321), 1, 0).astype(jnp.int32)
            lj0 = lj + tok
            acc = acc + probe
        return acc
    ts = {}
    for k in (1, 9):
        r = chain(*args, k=k); float(r)
        t0 = time.perf_counter(); r = chain(*args, k=k); float(r)
        ts[k] = time.perf_counter() - t0
    per = (ts[9] - ts[1]) / 8
    print(f"{label:30s} {per*1e3:7.2f} ms/inv -> {B*65536/per/1e9:5.2f} Gpts/s")

for v, label in (
    ({}, "baseline"),
    ({"rank": "roll"}, "rank=roll"),
    ({"no_window": True}, "no window loads/gather"),
    ({"no_refill": True}, "no refill at all"),
    ({"no_lut": True}, "no lut gathers"),
):
    try:
        slope(make_fn(v), label)
    except Exception as e:
        print(label, "FAIL", repr(e)[:120])
