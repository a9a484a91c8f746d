"""Does in-kernel (Mosaic) f32 arithmetic bit-match XLA's on TPU?

The fused project kernel computes 1/w, ndc multiplies, f32->i32 casts,
and bitcasts; the exactness gate compares its output against the XLA
projection.  This probes each op for bit-identity on real hardware.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
N = 1 << 16
# w values: positive depths spanning magnitudes + awkward mantissas
w = (rng.random(N, np.float32) * 1e4 + 1e-3).astype(np.float32)
x = (rng.standard_normal(N).astype(np.float32) * 1e3)
w_d = jnp.asarray(w.reshape(-1, 128))
x_d = jnp.asarray(x.reshape(-1, 128))


def kernel(w_ref, x_ref, o_inv, o_mul, o_cast, o_div):
    inv = 1.0 / w_ref[:]
    o_inv[:] = jax.lax.bitcast_convert_type(inv, jnp.int32)
    o_mul[:] = jax.lax.bitcast_convert_type(x_ref[:] * inv, jnp.int32)
    o_cast[:] = ((x_ref[:] * inv) * 0.5 * 1920.0).astype(jnp.int32)
    o_div[:] = jax.lax.bitcast_convert_type(x_ref[:] / w_ref[:], jnp.int32)


outs = pl.pallas_call(
    kernel,
    out_shape=[jax.ShapeDtypeStruct(w_d.shape, jnp.int32)] * 4,
)(w_d, x_d)

inv_x = jax.lax.bitcast_convert_type(1.0 / w_d, jnp.int32)
mul_x = jax.lax.bitcast_convert_type(x_d * (1.0 / w_d), jnp.int32)
cast_x = ((x_d * (1.0 / w_d)) * 0.5 * 1920.0).astype(jnp.int32)
div_x = jax.lax.bitcast_convert_type(x_d / w_d, jnp.int32)

for name, k, xr in [("1/w", outs[0], inv_x), ("x*(1/w)", outs[1], mul_x),
                    ("f32->i32 cast", outs[2], cast_x), ("x/w", outs[3], div_x)]:
    k = np.asarray(k); xr = np.asarray(xr)
    neq = int((k != xr).sum())
    print(f"{name:14s} mismatches: {neq}/{k.size}", flush=True)


# ---- affine-chain contraction probe: t0*x + t1*y + t2*z + tb ----
a = (rng.standard_normal(N).astype(np.float32)).reshape(-1, 128)
b = (rng.standard_normal(N).astype(np.float32)).reshape(-1, 128)
c = (rng.standard_normal(N).astype(np.float32)).reshape(-1, 128)
a_d, b_d, c_d = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
t0, t1, t2, t3 = 1.1234567, -2.2345678, 3.3456789, 0.123456


def kernel2(a_ref, b_ref, c_ref, o_ref):
    v = t0 * a_ref[:] + t1 * b_ref[:] + t2 * c_ref[:] + t3
    o_ref[:] = jax.lax.bitcast_convert_type(v, jnp.int32)


k2 = pl.pallas_call(
    kernel2, out_shape=jax.ShapeDtypeStruct(a_d.shape, jnp.int32)
)(a_d, b_d, c_d)


@jax.jit
def xla2(a, b, c):
    v = t0 * a + t1 * b + t2 * c + t3
    return jax.lax.bitcast_convert_type(v, jnp.int32)


x2 = xla2(a_d, b_d, c_d)
neq = int((np.asarray(k2) != np.asarray(x2)).sum())
print(f"affine chain    mismatches: {neq}/{k2.size}", flush=True)
