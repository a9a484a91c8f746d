"""Where do the 78 ms go in the rows-based frame?  Slope-times the
batched sort, the rows table build alone, and the full rows merge."""
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

SWZ = swizzle_dims(W, H)[2]
pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale, offset_rel,
    W, H, "color", fmt="fixed", tb=tb)
n = pid.shape[0] // SORT_ROWS
sp, sd, sy = [jax.block_until_ready(x) for x in jax.lax.sort(
    [pid.reshape(SORT_ROWS, n).astype(jnp.uint32), dep.reshape(SORT_ROWS, n),
     pay.reshape(SORT_ROWS, n)], num_keys=1, is_stable=False, dimension=1)]
print(f"rows={SORT_ROWS} n={n}", flush=True)


def slope(fn, label, k2=6):
    ts = {}
    for k in (1, k2):
        float(fn(k))
        t0 = time.perf_counter()
        float(fn(k))
        ts[k] = time.perf_counter() - t0
    ms = (ts[k2] - ts[1]) / (k2 - 1) * 1e3
    print(f"{label:24s} {ms:8.2f} ms", flush=True)
    return ms


@functools.partial(jax.jit, static_argnames=("k",))
def f_sort(k):
    acc = jnp.uint32(0)
    a = pid.reshape(SORT_ROWS, n).astype(jnp.uint32)
    for _ in range(k):
        o = jax.lax.sort([a, sd, sy], num_keys=1, is_stable=False,
                         dimension=1)
        probe = o[0][0, 0]
        acc += probe
        a = a + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(
            jnp.uint32)
    return acc


# table build only: replicate _dense_rows_group up to wrowtile
def table_build(sp2d, size):
    S, nn = sp2d.shape
    TILE, LANES, TPS, SUBS = pm.TILE, pm.LANES, pm.TPS, pm.SUBS
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    rowstride = nn // LANES
    nrows = S * rowstride
    bounds = jnp.arange(ntiles_pad + 1, dtype=jnp.uint32) * TILE
    starts = jax.vmap(
        lambda a: jnp.searchsorted(a, bounds).astype(jnp.int32))(sp2d)
    s0, s1 = starts[:, :-1], starts[:, 1:]
    first_row_local = s0 // LANES
    span = s1 - first_row_local * LANES
    nwin = jnp.where(s1 > s0, (span + TILE - 1) // TILE, 0)
    first_row = first_row_local + (
        jnp.arange(S, dtype=jnp.int32) * rowstride)[:, None]
    stream_end = (jnp.arange(S, dtype=jnp.int32) + 1) * rowstride
    nwin_tot = nwin.sum(axis=0, dtype=jnp.int32)
    wmax = S * ntiles_pad + S * (nn // TILE)
    cumwin = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nwin_tot, dtype=jnp.int32)])
    gidx = jnp.arange(wmax, dtype=jnp.int32)
    wtile = jnp.clip(
        jnp.searchsorted(cumwin, gidx, side="right").astype(jnp.int32) - 1,
        0, ntiles_pad - 1)
    wloc = gidx - jnp.take(cumwin, wtile)
    base = jnp.concatenate(
        [jnp.zeros((1, ntiles_pad), jnp.int32),
         jnp.cumsum(nwin, axis=0, dtype=jnp.int32)])
    base_rows = base.T[wtile]
    sid = jnp.sum(base_rows <= wloc[:, None], axis=1).astype(jnp.int32) - 1
    sidc = jnp.clip(sid, 0, S - 1)
    local = wloc - jnp.take_along_axis(base_rows, sidc[:, None], axis=1)[:, 0]
    row = first_row[sidc, wtile] + local * SUBS
    row = jnp.minimum(row, jnp.take(stream_end, sidc) - SUBS)
    row = jnp.where(sid >= S, nrows - SUBS, row)
    return (row << 2) | (wtile & 3), cumwin


@functools.partial(jax.jit, static_argnames=("k",))
def f_table(k):
    acc = jnp.uint32(0)
    a = sp
    for _ in range(k):
        wrt, cw = table_build(a, SWZ)
        probe = wrt[0].astype(jnp.uint32) + cw[-1].astype(jnp.uint32)
        acc += probe
        a = sp + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(
            jnp.uint32)
    return acc


@functools.partial(jax.jit, static_argnames=("k",))
def f_rows_merge(k):
    acc = jnp.uint32(0)
    a = sp
    for _ in range(k):
        fd, fp = pm.dense_from_sorted_rows(a, sd, sy, SWZ, True)
        probe = fp[0] + fd[0]
        acc += probe
        a = sp + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(
            jnp.uint32)
    return acc


slope(f_sort, "batched sort 128 rows")
slope(f_table, "table build only")
slope(f_rows_merge, "rows merge total")
