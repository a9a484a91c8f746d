"""Merge window counts vs stream segmentation on the real bench frame.

The (256 x 16384) batched sort costs 0.87 ms vs 6.4 ms flat
(r3_sort_menu), but each stream adds ~1 window per covered tile to the
merge.  This computes the exact window count (the _dense_nk1_group
formula) for candidate segmentations, with and without chain collapse.
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
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
TILE, LANES = 1024, 128
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                        target=(1000.0, 1000.0, 100.0)))
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

for cc in (False, True):
    pid, _dep, _pay = render_chunk_native(
        las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale,
        offset_rel, W, H, "color", fmt="fixed", tb=tb, use_pallas=True,
        interpret=jax.default_backend() != "tpu", chain_collapse=cc)
    pid = np.asarray(pid).astype(np.uint32)
    N = pid.size
    SIZE = W * H
    ntiles = -(-SIZE // TILE)
    bounds = np.arange(ntiles + 1, dtype=np.uint32) * TILE
    print(f"chain_collapse={cc}: real={int((pid < SIZE).sum())}", flush=True)
    for rows in (1, 16, 64, 128, 256, 512, 1024):
        n = N // rows
        spid = np.sort(pid.reshape(rows, n), axis=1)
        tot = 0
        for s in range(rows):
            st = np.searchsorted(spid[s], bounds).astype(np.int64)
            s0, s1 = st[:-1], st[1:]
            first_row = s0 // LANES
            span = s1 - first_row * LANES
            nwin = np.where(s1 > s0, (span + TILE - 1) // TILE, 0)
            tot += int(nwin.sum())
        print(f"  rows={rows:5d} n={n:8d}: windows={tot}", flush=True)

# ---- swizzled pid space: 32x32-px tiles instead of half-scanline strips ----
TX, TY = 32, 32
WT = W // TX            # 60 tile cols
HT = -(-H // TY)        # 34 tile rows (1088 padded)
SWZ = WT * HT * TILE
pid, _dep, _pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale,
    offset_rel, W, H, "color", fmt="fixed", tb=tb, use_pallas=True,
    interpret=jax.default_backend() != "tpu", chain_collapse=False)
pid = np.asarray(pid).astype(np.uint32)
live = pid < W * H
px = (pid % W).astype(np.int64)
py = (pid // W).astype(np.int64)
spz = ((py // TY) * WT + px // TX) * TILE + (py % TY) * TX + px % TX
pid2 = np.where(live, spz, SWZ).astype(np.uint32)
ntiles2 = WT * HT
bounds2 = np.arange(ntiles2 + 1, dtype=np.uint32) * TILE
print(f"swizzled 32x32 ({ntiles2} tiles):", flush=True)
for rows in (1, 16, 64, 128, 256, 512, 1024):
    n = pid2.size // rows
    spid = np.sort(pid2.reshape(rows, n), axis=1)
    tot = 0
    for s in range(rows):
        st = np.searchsorted(spid[s], bounds2).astype(np.int64)
        s0, s1 = st[:-1], st[1:]
        first_row = s0 // LANES
        span = s1 - first_row * LANES
        nwin = np.where(s1 > s0, (span + TILE - 1) // TILE, 0)
        tot += int(nwin.sum())
    print(f"  rows={rows:5d} n={n:8d}: windows={tot}", flush=True)
