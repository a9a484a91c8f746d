"""Stage anatomy of the CURRENT clipped window-table build (device
traces; the old r3_build_parts.py predates the clip + scatter-max
expansion).  Stages are cumulative prefixes of
pallas_merge.build_rows_window_table(clip=CLIP_TILES); stage cost =
difference of consecutive rows.

Also times two candidates:
  wcap    own/cummax/rec domains truncated to a 16K window cap
          (device-checkable: cumwin[-1] <= cap)
  live    histogram input sliced to the live prefix of each sorted row
          (live entries sort before the OOB sentinels; a n/2 static
          slice is device-checkable via sp[:, n//2] == sentinel)
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
from pcrhpg24_tpu.render.raster import swizzle_dims
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 8
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
sp, = [jax.block_until_ready(jax.lax.sort(
    [pid.reshape(SORT_ROWS, n).astype(jnp.uint32)],
    num_keys=1, is_stable=False, dimension=1)[0])]

TILE, LANES, TPS, SUBS = pm.TILE, pm.LANES, pm.TPS, pm.SUBS
TPS_BITS = pm.TPS_BITS
S = SORT_ROWS
size = SIZE
clip = pm.CLIP_TILES
wide = pm.ILP_WIDE
ntiles = -(-size // TILE)
nprog = -(-ntiles // TPS)
ntiles_pad = nprog * TPS
rowstride = n // LANES
nrows = S * rowstride
nlive = int(np.asarray((sp < jnp.uint32(size)).sum()))
print(f"view={VIEW} live={nlive} ({nlive/sp.size:.0%} of {sp.size})",
      flush=True)


def build_prefix(sp2d, stage: str, wcap=None):
    """Cumulative prefix of the clipped build, cut after `stage`."""
    grid = clip
    F = int(np.ceil(np.sqrt(grid + 1)))
    tile = jnp.minimum(sp2d >> 10, jnp.uint32(ntiles)).astype(jnp.int32)
    wt_c = wt_cols
    bx, by, cw, _ch = pm._tile_boxes(sp2d, size, wt_c)
    if stage == "boxes":
        return bx + by + cw
    tx = tile % wt_c
    ty = tile // wt_c
    loc = (ty - by[:, None]) * cw[:, None] + (tx - bx[:, None])
    loc = jnp.where(tile < ntiles, jnp.clip(loc, 0, clip), clip)
    hi = loc // F
    lo = loc - hi * F
    A = (hi[:, :, None] == jnp.arange(F, dtype=jnp.int32)).astype(jnp.int8)
    Bm = (lo[:, :, None] == jnp.arange(F, dtype=jnp.int32)).astype(jnp.int8)
    counts = jax.lax.dot_general(
        A, Bm, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).reshape(S, F * F)[:, :grid]
    if stage == "counts":
        return counts.reshape(-1)[::97]
    s1 = jnp.cumsum(counts, axis=1, dtype=jnp.int32)
    s0 = s1 - counts
    first_row_local = s0 // LANES
    span = s1 - first_row_local * LANES
    nwin = jnp.where(s1 > s0, (span + TILE - 1) // TILE, 0)
    first_row = first_row_local + (
        jnp.arange(S, dtype=jnp.int32) * rowstride)[:, None]
    if stage == "nwin":
        return (nwin + first_row).reshape(-1)[::97]

    wmax = S * grid + S * (n // TILE) + nprog * (wide - 1)
    lt_iota = jnp.arange(clip, dtype=jnp.int32)[None, :]
    gtile = ((by[:, None] + lt_iota // cw[:, None]) * wt_c
             + bx[:, None] + lt_iota % cw[:, None])
    gtile = jnp.where(nwin > 0, gtile, ntiles_pad - 1)
    F2 = int(np.ceil(np.sqrt(ntiles_pad)))
    g2 = gtile.reshape(-1)
    hi2 = (g2 // F2)[:, None] == jnp.arange(F2, dtype=jnp.int32)
    lo2 = (g2 - (g2 // F2) * F2)[:, None] == jnp.arange(F2, dtype=jnp.int32)
    wt = jax.lax.dot_general(
        hi2.astype(jnp.int8) * nwin.reshape(-1)[:, None].astype(jnp.int8),
        lo2.astype(jnp.int8),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(F2 * F2)[:ntiles_pad]
    pad = jnp.zeros(nprog, jnp.int32)
    psum = wt.reshape(nprog, TPS).sum(axis=1)
    pad = (-psum) % wide
    wt = wt.reshape(nprog, TPS).at[:, TPS - 1].add(pad).reshape(ntiles_pad)
    cumwin = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(wt, dtype=jnp.int32)])
    if stage == "whist":
        return cumwin[::7]
    sidx = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[:, None], (S, clip)).reshape(-1)
    key = jnp.concatenate([
        gtile.reshape(-1) * (S + 1) + sidx,
        (jnp.arange(nprog, dtype=jnp.int32) * TPS + TPS - 1) * (S + 1) + S,
    ])
    cnt = jnp.concatenate([nwin.reshape(-1), pad])
    fval = jnp.concatenate([
        (first_row.reshape(-1) << 2) | (gtile.reshape(-1) & (TPS - 1)),
        jnp.full(nprog, ((nrows - SUBS) << 2) | (TPS - 1), jnp.int32),
    ])
    send = jnp.concatenate([
        (sidx + 1) * rowstride, jnp.full(nprog, nrows, jnp.int32),
    ])
    _k, cnt, fval, send = jax.lax.sort(
        [key, cnt, fval, send], num_keys=1, is_stable=False)
    if stage == "sort":
        return (cnt + fval).reshape(-1)[::97]
    M = cnt.shape[0]
    m_iota = jnp.arange(M, dtype=jnp.int32)
    W_ = wcap or wmax
    gidx = jnp.arange(W_, dtype=jnp.int32)
    cumc = jnp.cumsum(cnt, dtype=jnp.int32)
    ex = cumc - cnt
    own = jnp.zeros(W_, jnp.int32).at[ex].max(m_iota, mode="drop")
    own = jax.lax.cummax(own)
    if stage == "own":
        return own[::31]
    rec = jnp.take(jnp.stack([fval, ex, send]), own, axis=1)
    wf, we, wsend = rec[0], rec[1], rec[2]
    row = (wf >> 2) + (gidx - we) * SUBS
    rowc = jnp.minimum(jnp.maximum(row, 0), wsend - SUBS)
    wrowtile = (rowc << TPS_BITS) | (wf & (TPS - 1))
    return wrowtile[::31] + cumwin[::7].sum()


def measure(fn, label):
    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            sp2 = sp + (acc & jnp.uint32(1))
            out = fn(sp2)
            f = out.reshape(-1)
            acc = acc ^ jnp.bitwise_xor.reduce(
                f[:: max(1, f.shape[0] // 2048)].astype(jnp.uint32))
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    print(f"{label:28s} {ms:8.3f} ms", flush=True)
    return ms


measure(lambda a: build_prefix(a, "boxes"), "1 boxes")
measure(lambda a: build_prefix(a, "counts"), "2 +counts hist")
measure(lambda a: build_prefix(a, "nwin"), "3 +nwin math")
measure(lambda a: build_prefix(a, "whist"), "4 +weighted hist")
measure(lambda a: build_prefix(a, "sort"), "5 +pair sort")
measure(lambda a: build_prefix(a, "own"), "6 +own scatter/cummax")
measure(lambda a: build_prefix(a, "full"), "7 FULL build")
measure(lambda a: build_prefix(a, "full", wcap=16384), "7b FULL, wcap=16K")
measure(lambda a: build_prefix(a[:, : n // 2], "full"), "7c FULL, live n/2")
measure(lambda a: build_prefix(a[:, : n // 2], "full", wcap=16384),
        "7d FULL, live n/2 + wcap")
