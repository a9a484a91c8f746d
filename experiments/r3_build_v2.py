"""v2 table build (clipped 2D box + sort-free expansion) on the real
bench stream: fits-check stats, build cost clipped vs full, and the
merge kernel at suffix_steps 6 vs 10 in isolation.
"""
import sys, pathlib, time, functools, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native, SORT_ROWS,
)
from pcrhpg24_tpu.render.raster import swizzle_dims
import pcrhpg24_tpu.render.pallas_merge as pm
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
VIEWS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
m = None
WT, _HT, SWZ = swizzle_dims(W, H)


def stream_for(name):
    global m
    r.apply_setting(VIEWS[name])
    if m is None:
        m = HuffmanTpu(r, las)
        m.update(r)
        las.wait_loaded(r)
    r.controls_update()
    wvp, lod_full = m.frame_setup(r)
    scale = jnp.asarray(las.scale, jnp.float32)
    offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
    cam = r.camera
    tb = jnp.asarray(batch_translations(
        (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
        las.scale, las.offset, las.las_min))
    pid, dep, pay = render_chunk_native(
        las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale,
        offset_rel, W, H, "color", fmt="fixed", tb=tb)
    n = pid.shape[0] // SORT_ROWS
    return [jax.block_until_ready(x) for x in jax.lax.sort(
        [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
         dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
        num_keys=1, is_stable=False, dimension=1)]


def slope(f, label, k2=6):
    @functools.partial(jax.jit, static_argnames=("k",))
    def g(a, k):
        acc = jnp.uint32(0)
        x = a
        for _ in range(k):
            out = f(x)
            probe = out.reshape(-1)[0].astype(jnp.uint32)
            acc += probe
            x = a + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(
                jnp.uint32)
        return acc

    ts = {}
    for k in (1, k2):
        float(g(sp, k))
        t0 = time.perf_counter()
        float(g(sp, k))
        ts[k] = time.perf_counter() - t0
    ms = (ts[k2] - ts[1]) / (k2 - 1) * 1e3
    print(f"{label:34s} {ms:8.2f} ms", flush=True)


for view in ("orbit", "closeup", "oblique"):
    sp, sd, sy = stream_for(view)
    bx, by, cw, ch = [np.asarray(v) for v in pm._tile_boxes(sp, SWZ, WT)]
    area = cw.astype(np.int64) * ch
    print(f"[{view}] box area p50={np.percentile(area,50):.0f} "
          f"p100={area.max()} fits512={bool(area.max() <= 512)} "
          f"runs_ok={bool(pm._runs_bounded(sp, SWZ))}", flush=True)

sp, sd, sy = stream_for("orbit")

slope(lambda a: pm.build_rows_window_table(a, SWZ, 2, clip=None)[1],
      "build FULL grid (sort-free)")
slope(lambda a: pm.build_rows_window_table(a, SWZ, 2, clip=512,
                                           tile_cols=WT)[1],
      "build CLIPPED 512 2D")

for steps in (10, 6):
    def f(a, steps=steps):
        cumwin, wrowtile, nrows, nprog = pm.build_rows_window_table(
            a, SWZ, 2, clip=512, tile_cols=WT)
        as_i32 = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.uint32), jnp.int32).reshape(-1, 128)
        from functools import partial
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        ntiles = -(-SWZ // pm.TILE)
        nprog2 = -(-ntiles // pm.TPS)
        kern = partial(pm._merge_nk1_kernel_ilp, nrows=nrows,
                       wide=pm.ILP_WIDE, suffix_steps=steps)
        outspec = pl.BlockSpec((pm.TPS * pm.SUBS, 128), lambda i: (i, 0))
        outshape = jax.ShapeDtypeStruct(
            (nprog2 * pm.TPS * pm.SUBS, 128), jnp.int32)
        win = pltpu.VMEM((pm.RING, pm.SUBS, 128), jnp.int32)
        outs = pl.pallas_call(
            kern, grid=(nprog2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[outspec] * 2, out_shape=[outshape] * 2,
            scratch_shapes=[win] * 3
            + [pltpu.SemaphoreType.DMA((pm.RING, 3))],
        )(cumwin, wrowtile, as_i32(a), as_i32(sd), as_i32(sy))
        return outs[1]
    slope(f, f"build+kernel suffix_steps={steps}")
