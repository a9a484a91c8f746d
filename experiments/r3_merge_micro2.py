"""Merge-kernel op-reduction variants (the sweep in r3_merge_micro.py
showed WIDE>2 hurts => issue-bound => only fewer/cheaper ops help).

Variants (cumulative):
  base      current production kernel (wide=2, 5-step suffix)
  bprobe    first 3 binary-search probes via constant-position broadcasts
            (probe positions for b=512/256/128 take 1/2/4 known values)
  lanesfx   lane-only suffix-min (5 lane steps + one next-row head fixup;
            exact for runs < 128, checked by the caller's runs bound)
  sharedg   final hit/cd/cp gathers share addressing masks
  all       everything

Each exactness-checked against the XLA scatter resolve.
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

TPS, SUBS, LANES, RING = pm.TPS, pm.SUBS, pm.LANES, pm.RING
WIDE = 2
as_i32 = lambda x: jax.lax.bitcast_convert_type(
    x.astype(jnp.uint32), jnp.int32).reshape(-1, LANES)
spi, sdi, syi = as_i32(sp), as_i32(sd), as_i32(sy)
cumwin, wrowtile, nrows, nprog = jax.block_until_ready(
    pm.build_rows_window_table(sp, SIZE, wide=WIDE,
                               clip=pm.CLIP_TILES, tile_cols=wt_cols))
ntiles_pad = nprog * TPS
print(f"view={VIEW} windows={int(np.asarray(cumwin)[-1])}", flush=True)

def LANE():
    return jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)


def SROW():
    return jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)


def bcast_row(t, s):
    """Plane filled with t[s, :]'s value (t is a lane-broadcast column).

    Mosaic has no both-axes broadcast and folds slice+broadcast chains
    back into one; a masked cross-sublane max produces a genuine (1, L)
    vector whose sublane broadcast IS single-axis.
    """
    vals = jnp.where(SROW() == s, t, jnp.int32(-0x80000000))
    m = jnp.max(vals, axis=0, keepdims=True)
    return jnp.broadcast_to(m, (SUBS, LANES))


def suffix_min_lane(lpid, d, p, steps):
    """Lane-only segmented suffix-min, exact for runs < 128.

    Phase 1: suffix-min within each 128-lane row (lane rolls only).
    Phase 2: rows whose tail run continues into the next row take the
    next row's head-run min (lane-0 phase-1 value, broadcast + one
    sublane roll).  Sortedness makes 'same pid as next row's first
    entry' equivalent to 'run crosses the boundary'.
    """
    s = 1
    while s < (1 << steps):
        rl = pltpu.roll(lpid, shift=LANES - s, axis=1)
        rd = pltpu.roll(d, shift=LANES - s, axis=1)
        rp = pltpu.roll(p, shift=LANES - s, axis=1)
        valid = (rl == lpid) & (LANE() < LANES - s)
        less = (rd < d) | ((rd == d) & (rp < p))
        take = valid & less
        d = jnp.where(take, rd, d)
        p = jnp.where(take, rp, p)
        s *= 2
    # the lane-0 column broadcast, rolled up one row, hands row r the
    # phase-1 value of row r+1's first entry
    nl = pltpu.roll(
        jnp.broadcast_to(lpid[:, 0:1], (SUBS, LANES)), shift=SUBS - 1,
        axis=0)
    nd = pltpu.roll(
        jnp.broadcast_to(d[:, 0:1], (SUBS, LANES)), shift=SUBS - 1, axis=0)
    np_ = pltpu.roll(
        jnp.broadcast_to(p[:, 0:1], (SUBS, LANES)), shift=SUBS - 1, axis=0)
    valid = (nl == lpid) & (SROW() < SUBS - 1)
    less = (nd < d) | ((nd == d) & (np_ < p))
    take = valid & less
    return jnp.where(take, nd, d), jnp.where(take, np_, p)


def search_bcast(lpid, pidrows, iota):
    """Binary search with the first 3 probes from broadcast constants."""
    t = jnp.broadcast_to(lpid[:, 127:128], (SUBS, LANES))
    v511 = bcast_row(t, 3)
    v255 = bcast_row(t, 1)
    v767 = bcast_row(t, 5)
    v127 = bcast_row(t, 0)
    v383 = bcast_row(t, 2)
    v639 = bcast_row(t, 4)
    v895 = bcast_row(t, 6)
    m512 = v511 < iota
    pos = m512.astype(jnp.int32) * 512
    val2 = jnp.where(m512, v767, v255)
    m256 = val2 < iota
    pos = pos + m256.astype(jnp.int32) * 256
    val3 = jnp.where(m512, jnp.where(m256, v895, v639),
                     jnp.where(m256, v383, v127))
    pos = pos + (val3 < iota).astype(jnp.int32) * 128
    for b in (64, 32, 16, 8, 4, 2, 1):
        probe = pm._flat_gather(pidrows, pos + (b - 1))
        pos = pos + (probe < iota).astype(jnp.int32) * b
    return pos


def gather3_shared(pidrows, deprows, payrows, posc):
    """hit/cd/cp gathers sharing the per-rotation selection masks."""
    col = jnp.bitwise_and(posc, LANES - 1)
    row = jnp.right_shift(posc, 7)
    rel = (row - SROW()) & (SUBS - 1)
    hit = jnp.zeros((SUBS, LANES), jnp.int32)
    cd = jnp.zeros((SUBS, LANES), jnp.int32)
    cp = jnp.zeros((SUBS, LANES), jnp.int32)
    for s in range(SUBS):
        sel = rel == s
        hit = jnp.where(sel, jnp.take_along_axis(pidrows[s], col, axis=1),
                        hit)
        cd = jnp.where(sel, jnp.take_along_axis(deprows[s], col, axis=1), cd)
        cp = jnp.where(sel, jnp.take_along_axis(payrows[s], col, axis=1), cp)
    return hit, cd, cp


def make_kernel(bprobe, lanesfx, sharedg, steps=5):
    def kern(cumwin_ref, wrowtile_ref, *rest):
        (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
         wpid, wdep, wpay, sems) = rest
        prog = pl.program_id(0)
        bias = jnp.int32(-0x80000000)
        maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
        iota = SROW() * LANES + LANE()
        t0 = prog * TPS
        lo = cumwin_ref[t0]
        hi = cumwin_ref[t0 + TPS]

        def dma(g, slot):
            r0 = jnp.minimum(wrowtile_ref[g] >> pm.TPS_BITS, nrows - SUBS)
            return [
                pltpu.make_async_copy(spid_hbm.at[pl.ds(r0, SUBS), :],
                                      wpid.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(spay_hbm.at[pl.ds(r0, SUBS), :],
                                      wpay.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(sdep_hbm.at[pl.ds(r0, SUBS), :],
                                      wdep.at[slot], sems.at[slot, 2]),
            ]

        for rr in range(RING):
            @pl.when(lo + rr < hi)
            def _fill(rr=rr):
                for c in dma(lo + rr, rr):
                    c.start()

        def one(g, slot):
            for c in dma(g, slot):
                c.wait()
            lt = wrowtile_ref[g] & (TPS - 1)
            lpid = wpid[slot] - (t0 + lt) * 1024
            if lanesfx:
                depv, payv = suffix_min_lane(
                    lpid, wdep[slot] ^ bias, wpay[slot] ^ bias, steps)
            else:
                depv, payv = pm._suffix_min_u64(
                    lpid, wdep[slot] ^ bias, wpay[slot] ^ bias, steps)
            pidrows = pm._rows_of(lpid)
            if bprobe:
                pos = search_bcast(lpid, pidrows, iota)
            else:
                pos = jnp.zeros((SUBS, LANES), jnp.int32)
                for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                    probe = pm._flat_gather(pidrows, pos + (b - 1))
                    pos = pos + (probe < iota).astype(jnp.int32) * b
            posc = jnp.minimum(pos, 1024 - 1)
            if sharedg:
                hitp, cd, cp = gather3_shared(
                    pidrows, pm._rows_of(depv), pm._rows_of(payv), posc)
                hit = hitp == iota
            else:
                hit = pm._flat_gather(pidrows, posc) == iota
                cd = pm._flat_gather(pm._rows_of(depv), posc)
                cp = pm._flat_gather(pm._rows_of(payv), posc)
            return lt, hit, cd, cp

        def upd(best, res):
            lt, hit, cd, cp = res
            out = []
            for kk in range(TPS):
                bd, bp = best[2 * kk], best[2 * kk + 1]
                take = (lt == kk) & hit & ((cd < bd) | ((cd == bd) & (cp < bp)))
                out.append(jnp.where(take, cd, bd))
                out.append(jnp.where(take, cp, bp))
            return tuple(out)

        def body2(k, best):
            g0 = lo + WIDE * k
            ress = []
            for j in range(WIDE):
                g = g0 + j
                s = jax.lax.rem(g - lo, RING)
                ress.append(one(g, s))

                @pl.when(g + RING < hi)
                def _pf(g=g, s=s):
                    for c in dma(g + RING, s):
                        c.start()
            for res in ress:
                best = upd(best, res)
            return best

        init = (maxi,) * (2 * TPS)
        out = jax.lax.fori_loop(0, jax.lax.div(hi - lo, WIDE), body2, init)
        for kk in range(TPS):
            outp_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk + 1] ^ bias
            outd_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk] ^ bias

    return kern


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


def run(label, **kw):
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)
    kern = make_kernel(**kw)

    def call(sdv):
        return pl.pallas_call(
            kern, grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[outspec] * 2, out_shape=[outshape] * 2,
            scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
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
    print(f"{label:28s} {ms:6.2f} ms {'[OK]' if ok else '[FAIL]'}",
          flush=True)
    return ms


import traceback
for label, kw in [
    ("base", dict(bprobe=False, lanesfx=False, sharedg=False)),
    ("+bprobe", dict(bprobe=True, lanesfx=False, sharedg=False)),
    ("+lanesfx", dict(bprobe=False, lanesfx=True, sharedg=False)),
    ("+sharedg", dict(bprobe=False, lanesfx=False, sharedg=True)),
    ("all", dict(bprobe=True, lanesfx=True, sharedg=True)),
    ("all steps=4", dict(bprobe=True, lanesfx=True, sharedg=True, steps=4)),
]:
    try:
        run(label, **kw)
    except Exception as e:
        print(f"{label:28s} FAILED: {str(e)[:120]}", flush=True)
