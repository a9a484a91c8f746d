"""Merge-kernel ILP sweep: windows-per-iteration (WIDE) x DMA ring depth.

r3_kernel_floor.py attributes the 4.47 ms merge almost entirely to
compute (floor 0.31, suffix +1.47, probes/gathers +2.70) at ~4
effective cycles/vreg-op — a latency-bound profile.  WIDE gives the
scheduler independent dependency chains; this sweeps it with matching
table padding.  Every variant is exactness-checked against the XLA
scatter resolve.
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native, SORT_ROWS,
)
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import swizzle_dims, sorted_resolve_u64_min
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 10
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
VIEW = os.environ.get("VIEW", "orbit")
SETTINGS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
r.apply_setting(SETTINGS[VIEW])
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
cam = r.camera
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
wt_cols, _ht, SIZE = swizzle_dims(W, H)
lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)
pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), lod_d, scale, offr, W, H, "color",
    fmt="fixed", tb=tb)
n = pid.shape[0] // SORT_ROWS
sp, sd, sy = jax.block_until_ready(jax.lax.sort(
    [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
     dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
    num_keys=1, is_stable=False, dimension=1))
gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))
gt_d, gt_p = np.asarray(gt_d), np.asarray(gt_p)

TPS, SUBS, LANES = pm.TPS, pm.SUBS, pm.LANES
as_i32 = lambda x: jax.lax.bitcast_convert_type(
    x.astype(jnp.uint32), jnp.int32).reshape(-1, LANES)
spi, sdi, syi = as_i32(sp), as_i32(sd), as_i32(sy)


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


def run_variant(wide, ring, steps=5):
    pm.RING = ring
    cumwin, wrowtile, nrows, nprog = jax.block_until_ready(
        pm.build_rows_window_table(sp, SIZE, wide=wide,
                                   clip=pm.CLIP_TILES, tile_cols=wt_cols))
    ntiles_pad = nprog * TPS
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((ring, SUBS, LANES), jnp.int32)
    kern = partial(pm._merge_nk1_kernel_ilp, nrows=nrows, wide=wide,
                   suffix_steps=steps)

    def call(sdv):
        return pl.pallas_call(
            kern, grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[outspec] * 2, out_shape=[outshape] * 2,
            scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((ring, 3))],
        )(cumwin, wrowtile, spi, sdv, syi)

    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            sdv = jax.lax.bitcast_convert_type(
                sd ^ (acc & jnp.uint32(1)), jnp.int32).reshape(-1, LANES)
            outd, outp = call(sdv)
            acc = acc ^ sample(outp) ^ sample(outd)
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    tou32 = lambda o: jax.lax.bitcast_convert_type(
        o, jnp.uint32).reshape(ntiles_pad * 1024)[:SIZE]
    outd, outp = call(sdi)
    ok = (np.array_equal(np.asarray(tou32(outd)), gt_d)
          and np.array_equal(np.asarray(tou32(outp)), gt_p))
    tag = "[OK]" if ok else "[FAIL]"
    print(f"wide={wide} ring={ring:2d} steps={steps}: {ms:6.2f} ms {tag}",
          flush=True)
    return ms


print(f"view={VIEW} windows-base table wide=2", flush=True)
run_variant(2, 6)           # current production config
run_variant(3, 6)
run_variant(4, 8)
run_variant(4, 12)
run_variant(6, 12)
run_variant(8, 16)
