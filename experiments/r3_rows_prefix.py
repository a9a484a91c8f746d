"""SORT_ROWS below 128 + live-prefix table builds.

Two independent reductions of the resolve's fixed work:

* S=64 rows: the r3 sweep only went UP from 128 (windows grow with
  rows); going DOWN halves the (row, tile) pair count driving the
  merge kernel, paying a wider (more expensive) sort.  Worth it iff
  kernel - sort > 0.
* live-prefix builds: post-collapse ~50% of entries are OOB sentinels
  sorted to row tails; the table-build histograms only need the live
  prefix.  A static prefix slice (rowstride keeps HBM row addressing)
  + a one-compare device check (entry[PREF] is a sentinel in every
  row) halves the (S, n, F) one-hot domain.

Prints per-row live maxima (to pick PREF), window counts, and full
resolve times, exactness-gated per config.
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native,
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
_gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, False, use_pallas=False))
gt_p = np.asarray(gt_p)
N = pid.shape[0]


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


for S in (64, 96, 128):
    if N % (S * 128):
        continue
    n = N // S
    sp, sd, sy = jax.block_until_ready(jax.lax.sort(
        [pid.reshape(S, n).astype(jnp.uint32),
         dep.reshape(S, n), pay.reshape(S, n)],
        num_keys=1, is_stable=False, dimension=1))
    live = np.asarray((np.asarray(sp) < SIZE).sum(axis=1))
    _bx, _by, cw, ch = pm._tile_boxes(sp, SIZE, wt_cols)
    box = int(np.asarray(cw * ch).max())
    cumwin, _w, _nr, _np2 = pm.build_rows_window_table(
        sp, SIZE, wide=pm.ILP_WIDE, clip=pm.CLIP_TILES, tile_cols=wt_cols)
    print(f"S={S:4d} n={n} live max/row={live.max()}/{n} "
          f"({100*live.max()/n:.0f}%) boxmax={box} "
          f"windows={int(np.asarray(cumwin)[-1])}", flush=True)

    @jax.jit
    def sort_only(pidv, depv, payv):
        return jax.lax.sort(
            [pidv.reshape(S, n).astype(jnp.uint32),
             depv.reshape(S, n), payv.reshape(S, n)],
            num_keys=1, is_stable=False, dimension=1)

    @jax.jit
    def sort_chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            a, b, c = sort_only(pid, dep ^ (acc & jnp.uint32(1)), pay)
            acc = acc ^ sample(a) ^ sample(b) ^ sample(c)
        return acc

    jax.block_until_ready(sort_chain())
    ms_sort = device_ms(sort_chain, key="jit_sort_chain") / K

    for pref in (None, n // 2, 3 * n // 4):
        if pref is not None and (live.max() > pref or pref % 1024):
            print(f"   S={S} pref={pref}: live does not fit, skip")
            continue

        def resolve(spv, sdv, syv, pref=pref):
            fast_ok = pm._runs_bounded(spv, SIZE)
            if pref is None:
                cw_, wr_, nrows, nprog = pm.build_rows_window_table(
                    spv, SIZE, pm.ILP_WIDE, clip=pm.CLIP_TILES,
                    tile_cols=wt_cols, wcap=pm.WCAP)
            else:
                cw_, wr_, nrows, nprog = pm.build_rows_window_table(
                    spv[:, :pref], SIZE, pm.ILP_WIDE, clip=pm.CLIP_TILES,
                    tile_cols=wt_cols, wcap=pm.WCAP,
                    rowstride=n // 128)
            # kernel exactly as _dense_rows_group's fast path
            from functools import partial
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            ntiles = -(-SIZE // 1024)
            ntiles_pad = nprog * pm.TPS
            as_i32 = lambda x: jax.lax.bitcast_convert_type(
                x.astype(jnp.uint32), jnp.int32).reshape(-1, 128)
            planes = (as_i32(spv), as_i32(sdv), as_i32(syv))
            outspec = pl.BlockSpec((pm.TPS * 8, 128), lambda i: (i, 0))
            outshape = jax.ShapeDtypeStruct((ntiles_pad * 8, 128), jnp.int32)
            win = pltpu.VMEM((pm.RING, 8, 128), jnp.int32)

            def call(steps):
                kern = partial(pm._merge_nk1_kernel_ilp, nrows=nrows,
                               wide=pm.ILP_WIDE, suffix_steps=steps)
                return pl.pallas_call(
                    kern, grid=(nprog,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                    + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
                    out_specs=[outspec] * 2, out_shape=[outshape] * 2,
                    scratch_shapes=[win] * 3
                    + [pltpu.SemaphoreType.DMA((pm.RING, 3))],
                )(cw_, wr_, *planes)

            outd, outp = jax.lax.cond(
                fast_ok, lambda: call(pm.FAST_SUFFIX_STEPS),
                lambda: call(10))
            return jax.lax.bitcast_convert_type(
                outp, jnp.uint32).reshape(ntiles_pad * 1024)[:SIZE]

        @jax.jit
        def chain():
            acc = jnp.uint32(0)
            for _ in range(K):
                sdv = sd ^ (acc & jnp.uint32(1))
                acc = acc ^ sample(resolve(sp, sdv, sy))
            return acc

        jax.block_until_ready(chain())
        ms = device_ms(chain, key="jit_chain") / K
        got = np.asarray(jax.jit(resolve)(sp, sd, sy))
        ok = np.array_equal(got, gt_p)
        tot = ms + ms_sort
        print(f"   S={S} pref={pref}: sort {ms_sort:5.2f} + resolve "
              f"{ms:5.2f} = {tot:6.2f} ms  exact={ok}", flush=True)
