"""Decompose the oblique regression under matscatter adoption.

bench r3: matscatter (nk3 sort, suffix-free MXU scatter kernel) beat the
probe kernel (nk1 sort + in-kernel suffix-min) on orbit (7.30 -> 6.87)
and closeup (9.20 -> 8.28) but REGRESSED oblique (8.79 -> 9.66).  Per
view this measures each half of the swap separately on the same streams:

    sort nk1 / sort nk3            (XLA, device-traced)
    dense probe   (nk1 rows, fast suffix)   == old resolve
    dense matscat (nk3 rows, suffix-free)   == new resolve

so the regression attributes to the sort delta vs the kernel delta.
Both resolves are exactness-checked against the XLA scatter path.

Run: python experiments/r3_view_regression.py
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
    HuffmanTpu, render_chunk_native, SORT_ROWS,
)
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import swizzle_dims, sorted_resolve_u64_min
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 8
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
wt_cols, _ht, SIZE = swizzle_dims(W, H)
scale = jnp.asarray(las.scale, jnp.float32)
offr = jnp.asarray(las.offset - las.las_min, jnp.float32)


def streams_for(view):
    r.apply_setting(VIEWS[view])
    global m
    if m is None:
        m = HuffmanTpu(r, las)
        m.update(r)
        las.wait_loaded(r)
    r.controls_update()
    wvp, lod_full = m.frame_setup(r)
    cam = r.camera
    tb = jnp.asarray(batch_translations(
        (cam.proj() @ cam.view()),
        las.anchor_i[: las.dev["anchor"].shape[0]],
        las.scale, las.offset, las.las_min))
    lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)
    pid, dep, pay = render_chunk_native(
        las.dev, 0, jnp.asarray(wvp), lod_d, scale, offr, W, H, "color",
        fmt="fixed", tb=tb)
    n = pid.shape[0] // SORT_ROWS
    return (pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
            dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n),
            pid, dep, pay)


def sort_ms(p2, d2, y2, nk):
    # consume the FULL sorted outputs (strided xor-reduce): scalar-slice
    # consumers let XLA DCE/shrink the sort (the r3_fullsort trap)
    def sample(x):
        f = x.reshape(-1)
        return jnp.bitwise_xor.reduce(f[:: max(1, f.shape[0] // 4096)])

    @jax.jit
    def schain():
        acc = jnp.uint32(0)
        for _ in range(K):
            a = p2 ^ (acc & jnp.uint32(1))
            ss = jax.lax.sort([a, d2, y2], num_keys=nk, is_stable=False,
                              dimension=1)
            acc = acc ^ sample(ss[0]) ^ sample(ss[1]) ^ sample(ss[2])
        return acc
    jax.block_until_ready(schain())
    return device_ms(schain, key="jit_schain") / K


def dense_ms(sp, sd, sy, kernel, fully_sorted, gt):
    pm.MERGE_KERNEL = kernel
    pm.dense_from_sorted_rows.clear_cache()

    @jax.jit
    def dchain():
        acc = jnp.uint32(0)
        for _ in range(K):
            sdv = sd ^ (acc & jnp.uint32(1))
            _d, p = pm.dense_from_sorted_rows(
                sp, sdv, sy, SIZE, need_depth=False,
                tile_cols=wt_cols, fully_sorted=fully_sorted)
            f = p.reshape(-1)
            acc = acc ^ jnp.bitwise_xor.reduce(
                f[:: max(1, f.shape[0] // 4096)])
        return acc
    jax.block_until_ready(dchain())
    ms = device_ms(dchain, key="jit_dchain") / K
    _d, p = pm.dense_from_sorted_rows(
        sp, sd, sy, SIZE, need_depth=False, tile_cols=wt_cols,
        fully_sorted=fully_sorted)
    ok = np.array_equal(np.asarray(p), gt)
    return ms, ok


for view in ("orbit", "closeup", "oblique"):
    p2, d2, y2, pid, dep, pay = streams_for(view)
    live = int(np.asarray((p2 < SIZE).sum()))
    _gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
        pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))
    gt_p = np.asarray(gt_p)
    nk1 = jax.block_until_ready(jax.lax.sort(
        [p2, d2, y2], num_keys=1, is_stable=False, dimension=1))
    nk3 = jax.block_until_ready(jax.lax.sort(
        [p2, d2, y2], num_keys=3, is_stable=False, dimension=1))
    cumwin, _wrt, _nr, _np_ = jax.block_until_ready(
        pm.build_rows_window_table(nk3[0], SIZE, wide=1,
                                   clip=pm.CLIP_TILES, tile_cols=wt_cols))
    wins = int(np.asarray(cumwin)[-1])
    t_nk1 = sort_ms(p2, d2, y2, 1)
    t_nk3 = sort_ms(p2, d2, y2, 3)
    t_probe, ok_p = dense_ms(*nk1, "probe", False, gt_p)
    t_mat, ok_m = dense_ms(*nk3, "matscatter", True, gt_p)
    # third option: keep the cheap nk1 sort, restore run minima with the
    # in-kernel suffix-min (throughput-additive in matscatter)
    t_ms1, ok_s = dense_ms(*nk1, "matscatter", False, gt_p)
    print(f"{view:8s} live={live/1e6:5.2f}M windows={wins:5d} | "
          f"sort nk1={t_nk1:5.2f} nk3={t_nk3:5.2f} | "
          f"probe={t_probe:5.2f}{'' if ok_p else ' FAIL'} "
          f"matscat={t_mat:5.2f}{'' if ok_m else ' FAIL'} "
          f"matscat+sfx={t_ms1:5.2f}{'' if ok_s else ' FAIL'} | "
          f"old={t_nk1 + t_probe:5.2f} new={t_nk3 + t_mat:5.2f} "
          f"alt={t_nk1 + t_ms1:5.2f}",
          flush=True)
pm.MERGE_KERNEL = os.environ.get("PM_MERGE_KERNEL", "matscatter")
