"""RULED OUT: slab window tables (fence reductions) vs pair-grid builders.

Idea: the resolve's remaining fixed cost is the window-table build —
the pair-grid builder's (S, n, F) one-hot histogram operands cost
~2.2 ms at 128x32K even in int8 (r3_phases2).  Replace them with
per-slab fence REDUCTIONS (one pass over sp2d): windows become the
TILE-aligned 1024-entry slabs of each sorted row, duplicated once per
distinct framebuffer tile they span, with sub-slab (128-entry) ranges
dropping hole tiles.  The build is ~10x cheaper; an exact_hi kernel
variant (self-rounded trip count, clamped overshoot) removes the need
to pad per-program window counts.

Measured on the real 4.2M bench streams (this script):

    view     slab windows  pair windows  max tiles/slab
    orbit        11495         3682          545
    closeup       6833         5782          609
    oblique       9885         5350          239

Verdict: dead end.  Slabs are position-aligned, not tile-aligned, so
every slab that spans k tiles emits k windows regardless of how few
entries land in each — on the coherent orbit view that means 3.1x the
pair builder's window count, and single slabs span up to 609 tiles
(the MAXDUP=16 bounded expansion never fits), so the fast path would
never even fire.  At the measured 1.2 us/window kernel rate the extra ~7800
windows cost ~+9 ms against the ~2 ms of build saved.  The pair-grid
builder's per-(row, tile) windows are the right granularity precisely
because they never split a tile's entries and never materialize a
window for a tile a row only grazes.  Full-frame wiring (lax.cond on
`ok` with pair fallback) confirmed: frame time identical to the pair
path on all three views because `ok` never held.

The one-hot histogram build stays; its cost is attacked elsewhere
(wcap-bounded domains, live-prefix slicing — see r3_build_v3,
r3_rows_prefix).
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
from pcrhpg24_tpu.render.raster import swizzle_dims
import pcrhpg24_tpu.render.pallas_merge as pm
from pcrhpg24_tpu.render.camera import batch_translations

TILE, TPS, SUBS, LANES = pm.TILE, pm.TPS, pm.SUBS, pm.LANES
TPS_BITS = pm.TPS_BITS
MAXDUP = 16


def build_rows_slab_table(sp2d, size: int, wcap: int = pm.WCAP):
    """Fence-based slab window table (the ruled-out candidate)."""
    S, n = sp2d.shape
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    rowstride = n // LANES
    nslab = n // TILE
    tile = jnp.minimum(sp2d >> 10, jnp.uint32(ntiles)).astype(jnp.int32)
    trs = tile.reshape(S, nslab, SUBS, LANES)
    live = trs < ntiles
    sub_lo = trs[:, :, :, 0]
    sub_hi = jnp.max(jnp.where(live, trs, -1), axis=3)
    t0 = trs[:, :, 0, 0]
    t1 = jnp.max(sub_hi, axis=2)
    slab_live = t0 < ntiles
    dup = jnp.where(slab_live, t1 - t0 + 1, 0)

    j = jnp.arange(MAXDUP, dtype=jnp.int32)
    rt = t0[:, :, None] + j
    covered = jnp.any(
        (sub_lo[:, :, None, :] <= rt[:, :, :, None])
        & (rt[:, :, :, None] <= sub_hi[:, :, None, :]),
        axis=3,
    )
    valid = (j < dup[:, :, None]) & covered
    total = jnp.sum(valid, dtype=jnp.int32)
    ok = (jnp.max(dup) <= MAXDUP) & (total <= wcap)

    key = jnp.where(valid, rt, ntiles_pad).reshape(-1)
    r0 = (
        (jnp.arange(S, dtype=jnp.int32) * rowstride)[:, None]
        + jnp.arange(nslab, dtype=jnp.int32)[None, :] * SUBS
    )
    val = (r0[:, :, None] << TPS_BITS) | (rt & (TPS - 1))
    keys, vals = jax.lax.sort(
        [key, val.reshape(-1)], num_keys=1, is_stable=False
    )
    cumwin = jnp.searchsorted(
        keys, jnp.arange(ntiles_pad + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return cumwin, ok, jnp.max(dup)


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
    r.controls_update()
    if m is None:
        m = HuffmanTpu(r, las)
        m.update(r)
        las.wait_loaded(r)
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
    return jax.block_until_ready(jax.lax.sort(
        [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
         dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
        num_keys=1, is_stable=False, dimension=1)[0])


for view in VIEWS:
    sp = stream_for(view)
    scw, sok, sdup = jax.jit(
        build_rows_slab_table, static_argnums=(1,))(sp, SWZ)
    cw = jax.jit(pm.build_rows_window_table, static_argnums=(1, 2))(
        sp, SWZ, 2)[0]
    print(f"{view:8s} slab windows {int(scw[-1]):6d} ok={bool(sok)} "
          f"maxdup={int(sdup)}  pair windows {int(cw[-1]):6d}",
          flush=True)
