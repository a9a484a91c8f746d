"""Throughput of MXU-based partner exchange vs pltpu.roll for sorting.

Exchange at lane-stride d == multiply by a fixed permutation matrix.
i32 values ride as 4 int8 planes (exact recombination)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBL, LANES = 8, 128

def mk_kernel(mode, n_stages):
    def kern(x_ref, o_ref):
        x = x_ref[0].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
        if mode == "mxu":
            # permutation matrices for strides 1..64 as bf16 (0/1 exact)
            perms = {}
            for d in (1, 2, 4, 8, 16, 32, 64):
                r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                perms[d] = ((r ^ d) == c).astype(jnp.bfloat16)
        acc = x
        for s in range(n_stages):
            d = (1, 2, 4, 8, 16, 32, 64)[s % 7]
            if mode == "roll":
                fwd = pltpu.roll(acc, LANES - d, 1)
                bwd = pltpu.roll(acc, d, 1)
                p = jnp.where((lane & d) == 0, fwd, bwd)
            else:
                # 4 int8 planes through the MXU
                planes = []
                for k in range(4):
                    pk = ((acc >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
                    # pk values 0..255 exact in bf16? NO (8-bit mantissa: 0..255 needs 8 bits -> exact up to 256) OK
                    out = jax.lax.dot_general(
                        pk, perms[d], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    planes.append(out.astype(jnp.int32) << (8 * k))
                p = planes[0] | planes[1] | planes[2] | planes[3]
            acc = jnp.minimum(acc, p) + (acc > p).astype(jnp.int32)
        o_ref[0] = acc
    return kern

def run(mode, n_stages, x):
    spec = pl.BlockSpec((1, SUBL, LANES), lambda t: (t, 0, 0))
    f = pl.pallas_call(
        mk_kernel(mode, n_stages), grid=(x.shape[0],),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
    )
    return jax.jit(f)(x)

T = 256
x = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, (T, SUBL, LANES)).astype(np.int32))
for mode in ("roll", "mxu"):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k, m=mode):
        acc = jnp.int32(0)
        x0 = x
        for _ in range(k):
            o = run(m, 55, x0)
            probe = o[0, 0, 0]
            x0 = x + jnp.where(probe == jnp.int32(-1), 1, 0)
            acc += probe
        return acc
    ts = {}
    for k in (1, 5):
        o = chain(x, k=k); float(o)
        t0 = time.perf_counter(); o = chain(x, k=k); float(o)
        ts[k] = time.perf_counter() - t0
    per = (ts[5] - ts[1]) / 4
    n = T * 1024
    print(f"{mode}: 55 exchange-stages over {n}: {per*1e3:.2f} ms -> {n*55/per/1e9:.1f} G exchange-elem/s")
