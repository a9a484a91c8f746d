"""Position-aligned program-windows for the matscatter merge (round 4).

r3_phases2 re-attribution: window TABLE build ~1.5 ms/frame — second
only to the sort and bigger than the merge kernel itself (1.25 ms).
Root causes: (a) per-(row, tile) windows need a 138 MB one-hot
histogram materialization + wcap expansion + a 131K-record sort;
(b) fragmented views re-read window content up to 5.2x (closeup).

`pwin` redesign: windows are FIXED 1024-entry row slices (positions
k*1024), never tile-aligned.  Each window scatters to ALL TPS tiles of
its program at once: the one-hot sublane index widens to
hi5 = lpid>>7 in [0, TPS*8), the A operand to (nplanes*TPS*8, 128),
and the MXU absorbs the wider output.  Consequences:
  * window count collapses to ceil(live/1024) per row plus one extra
    record per program boundary a window's span crosses — the
    (row, tile) fragmentation term is GONE;
  * the table build needs only strided slices (first/last tile of each
    1024-slice), a ~4K-record expansion and one tiny sort — no dense
    one-hot histogram over the pair grid;
  * windows are naturally row-aligned (1024 = 8 stream rows), so no
    stream-end clamping and no reread logic at all.
Costs: the per-er A-build works on (TPS*8, 128) shapes (~2x the vreg
ops of the (8,128) build) and the dot is TPS x taller.

Measures, per view: current [table, kernel] vs pwin [table, kernel],
device-traced, bit-checked vs the XLA scatter path.
    python experiments/r4_pwin.py           # orbit
    VIEW=closeup python experiments/r4_pwin.py
"""
import sys, pathlib, os, math
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
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
VIEW = os.environ.get("VIEW", "orbit")
TPSW = int(os.environ.get("TPSW", "4"))  # tiles per program (pwin)
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
r.apply_setting(VIEWS[VIEW])
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
p2, d2, y2 = (pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
              dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n))
sp, sd, sy = jax.block_until_ready(jax.lax.sort(
    [p2, d2, y2], num_keys=3, is_stable=False, dimension=1))
gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))
gt_d, gt_p = np.asarray(gt_d), np.asarray(gt_p)

TPS, SUBS, LANES, RING = pm.TPS, pm.SUBS, pm.LANES, pm.RING
TILE = pm.TILE
PAY_PLANES = 3
NPLANES = 4 + PAY_PLANES
NTILES = -(-SIZE // TILE)
as_i32 = lambda x: jax.lax.bitcast_convert_type(
    x.astype(jnp.uint32), jnp.int32).reshape(-1, LANES)
spi, sdi, syi = as_i32(sp), as_i32(sd), as_i32(sy)

PCAP = 32768  # expansion cap (records)


def build_pwin_table(sp2d, size: int, tps: int, cap: int = PCAP):
    """Program-window table: (cumwin per program, start row per record).

    Records are (program, stream row) pairs, program-major.  A window =
    1024 entries at row positions k*1024 of one sorted row; it spans
    programs [tile(first)/tps, tile(last live)/tps] and contributes one
    record per program in that range.  Dead windows (first entry is the
    OOB sentinel) contribute none.
    """
    S, ncol = sp2d.shape
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // tps)
    WPR = ncol // TILE  # windows per row
    rowstride = ncol // LANES
    live_r = jnp.sum((sp2d < jnp.uint32(size)).astype(jnp.int32), axis=1)
    ts = jnp.minimum(sp2d[:, ::TILE] >> 10, jnp.uint32(ntiles)).astype(
        jnp.int32)                      # (S, WPR) first-entry tile
    epos = jnp.minimum(
        jnp.arange(1, WPR + 1, dtype=jnp.int32)[None, :] * TILE,
        live_r[:, None]) - 1
    epos = jnp.clip(epos, 0, ncol - 1)
    te = jnp.minimum(jnp.take_along_axis(sp2d, epos.astype(jnp.int32),
                                         axis=1) >> 10,
                     jnp.uint32(ntiles - 1)).astype(jnp.int32)
    livewin = ts < ntiles
    p0 = jnp.where(livewin, ts // tps, 0).reshape(-1)
    p1 = jnp.where(livewin, jnp.maximum(te // tps, ts // tps),
                   -1).reshape(-1)
    cnt = jnp.maximum(p1 - p0 + 1, 0)           # (S*WPR,)
    row0 = (jnp.arange(S, dtype=jnp.int32)[:, None] * rowstride
            + jnp.arange(WPR, dtype=jnp.int32)[None, :] * SUBS).reshape(-1)
    cumc = jnp.cumsum(cnt, dtype=jnp.int32)
    ex = cumc - cnt
    total = cumc[-1]
    # slot g -> owning (row, window) pair: inclusive cumsum of an
    # ex-histogram (same MXU trick as pm.build_rows_window_table)
    F3 = int(np.ceil(np.sqrt(cap + 1)))
    exc = jnp.minimum(ex, cap)
    eh = (exc // F3)[:, None] == jnp.arange(F3, dtype=jnp.int32)
    el = (exc - (exc // F3) * F3)[:, None] == jnp.arange(F3, dtype=jnp.int32)
    ehist = jax.lax.dot_general(
        eh.astype(jnp.int8), el.astype(jnp.int8),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    ).reshape(F3 * F3)[:cap]
    own = jnp.cumsum(ehist, dtype=jnp.int32) - 1
    gidx = jnp.arange(cap, dtype=jnp.int32)
    prog_g = jnp.take(p0, own) + (gidx - jnp.take(ex, own))
    row_g = jnp.take(row0, own)
    valid = gidx < total
    prog_g = jnp.where(valid, prog_g, nprog)    # sentinels sort last
    prog_s, row_s = jax.lax.sort([prog_g, row_g], num_keys=1,
                                 is_stable=False)
    cumwin = jnp.searchsorted(
        prog_s, jnp.arange(nprog + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return cumwin, row_s, total


def make_pwin_kernel(tps, NROWS):
    OS = tps * SUBS  # output sublanes per program

    def kern(cumwin_ref, wrow_ref, *rest):
        (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
         wpid, wdep, wpay, sems) = rest
        prog = pl.program_id(0)
        bias = jnp.int32(-0x80000000)
        maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
        srO = jax.lax.broadcasted_iota(jnp.int32, (OS, LANES), 0)
        flat = (jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1))
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        t0 = prog * tps
        lo_w = cumwin_ref[prog]
        hi_w = cumwin_ref[prog + 1]

        def dma(g, slot):
            r0 = wrow_ref[g]
            return [
                pltpu.make_async_copy(spid_hbm.at[pl.ds(r0, SUBS), :],
                                      wpid.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(spay_hbm.at[pl.ds(r0, SUBS), :],
                                      wpay.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(sdep_hbm.at[pl.ds(r0, SUBS), :],
                                      wdep.at[slot], sems.at[slot, 2]),
            ]

        for rr in range(RING):
            @pl.when(lo_w + rr < hi_w)
            def _fill(rr=rr):
                for c in dma(lo_w + rr, rr):
                    c.start()

        def one(g, slot):
            for c in dma(g, slot):
                c.wait()
            lpid = wpid[slot] - t0 * TILE
            depv = wdep[slot] ^ bias
            payv = wpay[slot] ^ bias
            prev = pm._shift_down1(lpid)
            head = ((lpid != prev) | (flat == 0)) & (lpid >= 0) & (
                lpid < tps * TILE)
            hiO = jnp.where(head, jnp.right_shift(lpid, 7), -1)
            lo7 = jnp.bitwise_and(lpid, LANES - 1)
            du = jax.lax.bitcast_convert_type(depv, jnp.uint32)
            pu = jax.lax.bitcast_convert_type(payv, jnp.uint32)
            cvs = [
                jnp.bitwise_and(jnp.right_shift(du, 8 * q),
                                jnp.uint32(255)).astype(jnp.int32)
                for q in range(4)
            ] + [
                jnp.bitwise_and(jnp.right_shift(pu, 8 * q),
                                jnp.uint32(255)).astype(jnp.int32)
                for q in range(PAY_PLANES)
            ]
            cvs[3] = cvs[3] + 1
            bcO = lambda x, er: jax.lax.broadcast_in_dim(
                x[er:er + 1, :], (OS, LANES), (0, 1))
            bcl = lambda x, er: jax.lax.broadcast_in_dim(
                x[er:er + 1, :], (LANES, LANES), (0, 1))
            OUT = None
            for er in range(SUBS):
                C = (bcl(lo7, er) == sub_iota).astype(jnp.bfloat16)
                mO = (bcO(hiO, er) == srO).astype(jnp.bfloat16)
                rows = [mO * bcO(cvs[q], er).astype(jnp.bfloat16)
                        for q in range(NPLANES)]
                A = jnp.concatenate(rows, axis=0)   # (NPLANES*OS, 128)
                d_ = jax.lax.dot_general(
                    A, C, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                OUT = d_ if OUT is None else OUT + d_
            conv = OUT.astype(jnp.int32)
            pls = [conv[q * OS:(q + 1) * OS, :] for q in range(NPLANES)]
            res = []
            for kk in range(tps):
                s = slice(kk * SUBS, (kk + 1) * SUBS)
                b3p = pls[3][s]
                hit = b3p != 0
                b3 = b3p - hit.astype(jnp.int32)
                cd = (pls[0][s] | (pls[1][s] << 8) | (pls[2][s] << 16)
                      | (b3 << 24))
                zero = jnp.zeros((SUBS, LANES), jnp.int32)
                pp = [pls[4 + q][s] for q in range(PAY_PLANES)] + \
                     [zero] * (3 - PAY_PLANES)
                cp = (pp[0] | (pp[1] << 8) | (pp[2] << 16)
                      | jnp.int32(-0x80000000))
                res.append((hit, cd, cp))
            return res

        def upd(best, res):
            out = []
            for kk in range(tps):
                bd, bp = best[2 * kk], best[2 * kk + 1]
                hit, cd, cp = res[kk]
                take = hit & ((cd < bd) | ((cd == bd) & (cp < bp)))
                out.append(jnp.where(take, cd, bd))
                out.append(jnp.where(take, cp, bp))
            return tuple(out)

        def body2(k, best):
            g = lo_w + k
            s = jax.lax.rem(g - lo_w, RING)
            res = one(g, s)

            @pl.when(g + RING < hi_w)
            def _pf():
                for c in dma(g + RING, s):
                    c.start()
            return upd(best, res)

        init = (maxi,) * (2 * tps)
        out = jax.lax.fori_loop(0, hi_w - lo_w, body2, init)
        for kk in range(tps):
            outp_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk + 1] ^ bias
            outd_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk] ^ bias

    return kern


def probe_tok(acc):
    return jnp.where(acc == jnp.uint32(0xFFFFFFFF), jnp.uint32(1),
                     jnp.uint32(0))


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


# ---- current production: table + kernel, device-traced separately ----
@jax.jit
def cur_table_chain():
    acc = jnp.uint32(0)
    for _ in range(K):
        cw, wr, _nr, _np_ = pm.build_rows_window_table(
            sp ^ probe_tok(acc), SIZE, wide=1, clip=pm.CLIP_TILES,
            tile_cols=wt_cols, wcap=pm.WCAP)
        acc = acc ^ sample(cw) ^ sample(wr)
    return acc


jax.block_until_ready(cur_table_chain())
cur_tab_ms = device_ms(cur_table_chain, key="jit_cur_table_chain") / K

cumwin_c, wrowtile_c, NROWS, NPROG_C = jax.block_until_ready(
    pm.build_rows_window_table(sp, SIZE, wide=1, clip=pm.CLIP_TILES,
                               tile_cols=wt_cols, wcap=pm.WCAP))


# time the production matscatter kernel on the prebuilt table
ntiles_pad_c = NPROG_C * TPS
outspec_c = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
outshape_c = jax.ShapeDtypeStruct((ntiles_pad_c * SUBS, LANES), jnp.int32)
win_c = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)
from functools import partial as _part
kern_c = _part(pm._merge_matscatter_kernel, nrows=NROWS, wide=1,
               suffix_steps=0, pay_planes=PAY_PLANES)


def call_cur(sdv):
    return pl.pallas_call(
        kern_c, grid=(NPROG_C,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[outspec_c] * 2, out_shape=[outshape_c] * 2,
        scratch_shapes=[win_c] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
    )(cumwin_c, wrowtile_c, spi, sdv, syi)


@jax.jit
def cur_kern_chain():
    acc = jnp.uint32(0)
    for _ in range(K):
        sdv = jax.lax.bitcast_convert_type(
            sd ^ (acc & jnp.uint32(1)), jnp.int32).reshape(-1, LANES)
        outd, outp = call_cur(sdv)
        acc = acc ^ sample(outp) ^ sample(outd)
    return acc


jax.block_until_ready(cur_kern_chain())
cur_kern_ms = device_ms(cur_kern_chain, key="jit_cur_kern_chain") / K
nw_c = int(np.asarray(cumwin_c)[-1])
print(f"{VIEW}: CURRENT  table {cur_tab_ms:6.2f} ms  kernel "
      f"{cur_kern_ms:6.2f} ms  windows {nw_c}", flush=True)

# ---------------------------- pwin ----------------------------------
@jax.jit
def pwin_table_chain():
    acc = jnp.uint32(0)
    for _ in range(K):
        cw, rs, _t = build_pwin_table(sp ^ probe_tok(acc), SIZE, TPSW)
        acc = acc ^ sample(cw) ^ sample(rs)
    return acc


jax.block_until_ready(pwin_table_chain())
pwin_tab_ms = device_ms(pwin_table_chain, key="jit_pwin_table_chain") / K

cumwin_p, rows_p, total_p = jax.block_until_ready(
    build_pwin_table(sp, SIZE, TPSW))
total_p = int(total_p)
assert total_p < PCAP, total_p
NPROG_P = -(-NTILES // TPSW)
kern_p = make_pwin_kernel(TPSW, NROWS)
ntiles_pad_p = NPROG_P * TPSW
outspec_p = pl.BlockSpec((TPSW * SUBS, LANES), lambda i: (i, 0))
outshape_p = jax.ShapeDtypeStruct((ntiles_pad_p * SUBS, LANES), jnp.int32)


def call_pwin(sdv):
    return pl.pallas_call(
        kern_p, grid=(NPROG_P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[outspec_p] * 2, out_shape=[outshape_p] * 2,
        scratch_shapes=[pltpu.VMEM((RING, SUBS, LANES), jnp.int32)] * 3
        + [pltpu.SemaphoreType.DMA((RING, 3))],
    )(cumwin_p, rows_p, spi, sdv, syi)


@jax.jit
def pwin_kern_chain():
    acc = jnp.uint32(0)
    for _ in range(K):
        sdv = jax.lax.bitcast_convert_type(
            sd ^ (acc & jnp.uint32(1)), jnp.int32).reshape(-1, LANES)
        outd, outp = call_pwin(sdv)
        acc = acc ^ sample(outp) ^ sample(outd)
    return acc


jax.block_until_ready(pwin_kern_chain())
pwin_kern_ms = device_ms(pwin_kern_chain, key="jit_pwin_kern_chain") / K

tou32 = lambda o: jax.lax.bitcast_convert_type(
    o, jnp.uint32).reshape(ntiles_pad_p * TILE)[:SIZE]
outd, outp = call_pwin(sdi)
ok = (np.array_equal(np.asarray(tou32(outd)), gt_d)
      and np.array_equal(np.asarray(tou32(outp)), gt_p))
tag = "[OK]" if ok else "[FAIL]"
print(f"{VIEW}: PWIN tps={TPSW}  table {pwin_tab_ms:6.2f} ms  kernel "
      f"{pwin_kern_ms:6.2f} ms  windows {total_p}  {tag}", flush=True)
print(f"{VIEW}: total current {cur_tab_ms + cur_kern_ms:6.2f} ms  "
      f"pwin {pwin_tab_ms + pwin_kern_ms:6.2f} ms", flush=True)
