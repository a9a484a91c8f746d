"""Flagship per-view decomposition + sort/window variants (round 5).

Round-4 frame at 4.2M orbit: decode+project 0.95 / sort nk3 1.98 /
table 0.92 / merge 1.24 = 5.05 ms (0.826 Gpts/s); closeup is the
WORST view (0.40 Gpts/s, 5.2x window fragmentation).  Device-traced
stages per bench view:

  stream    render_chunk_native (decode+project+BC1+collapse)
  sortA     nk3 at (128, 32768)  — the round-4 shape
  sortB     nk3 at (256, 16384)  — the probe's cheaper shape
  table     build_rows_window_table (wcap, clip)
  full      dense_from_sorted_rows (table + matscatter kernel)
  windows   window count per variant (fragmentation signal)

    python experiments/r5_flagship_parts.py
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from functools import partial

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
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
las.wait_loaded()
r = Renderer(W, H)
VIEWS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
wt_cols, _ht, SIZE = swizzle_dims(W, H)

m = HuffmanTpu(r, las)


def mk_sort(rows, n):
    @jax.jit
    def srt(pid, dep, pay):
        return jax.lax.sort(
            [pid.reshape(rows, n).astype(jnp.uint32),
             dep.reshape(rows, n), pay.reshape(rows, n)],
            num_keys=3, is_stable=False, dimension=1)
    return srt


def mk_table(win_rows):
    @jax.jit
    def tab(sp):
        return pm.build_rows_window_table(
            sp, SIZE, wide=1, clip=pm.CLIP_TILES, tile_cols=wt_cols,
            wcap=pm.WCAP, win_rows=win_rows)
    return tab


@jax.jit
def full_merge(sp, sd, sy):
    return pm.dense_from_sorted_rows(
        sp, sd, sy, SIZE, need_depth=False, tile_cols=wt_cols,
        fully_sorted=True, pay_bits=24)


@jax.jit
def stream_of(dev, wvp, lod_d, scale, offr, tb):
    return render_chunk_native(
        dev, 0, wvp, lod_d, scale, offr, W, H, "color", fmt="fixed",
        tb=tb)


for view, setting in VIEWS.items():
    r.apply_setting(setting)
    m.update(r)
    las.wait_loaded(r)
    r.controls_update()
    wvp, lod_full = m.frame_setup(r)
    scale = jnp.asarray(las.scale, jnp.float32)
    offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
    cam = r.camera
    tb = jnp.asarray(batch_translations(
        (cam.proj() @ cam.view()),
        las.anchor_i[: las.dev["anchor"].shape[0]],
        las.scale, las.offset, las.las_min))
    lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)
    wvpj = jnp.asarray(wvp)
    args = (las.dev, wvpj, lod_d, scale, offr, tb)
    pid, dep, pay = jax.block_until_ready(stream_of(*args))
    ms_stream = min(device_ms(stream_of, *args, key="jit_stream_of")
                    for _ in range(3))
    live = int((np.asarray(pid) < SIZE).sum())
    tot = pid.shape[0]
    print(f"\n{view}: stream {ms_stream:6.2f} ms  live {live/1e6:.2f}M "
          f"of {tot/1e6:.1f}M", flush=True)

    for rows, n in ((128, tot // 128), (256, tot // 256)):
        srt = mk_sort(rows, n)
        R = jax.block_until_ready(srt(pid, dep, pay))
        ms_s = min(device_ms(srt, pid, dep, pay, key="jit_srt")
                   for _ in range(3))
        tabf = mk_table(pm.SUBS)
        T = jax.block_until_ready(tabf(R[0]))
        ms_t = min(device_ms(tabf, R[0], key="jit_tab") for _ in range(3))
        nwin = int(np.asarray(T[0])[-1])
        F = jax.block_until_ready(full_merge(*R))
        ms_f = min(device_ms(full_merge, *R, key="jit_full_merge")
                   for _ in range(3))
        print(f"  rows={rows:4d} sort {ms_s:5.2f}  table {ms_t:5.2f} "
              f"(win {nwin:6d})  table+kernel {ms_f:5.2f}  "
              f"TOTAL {ms_stream + ms_s + ms_f:5.2f} ms", flush=True)
