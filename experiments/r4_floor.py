"""Matscatter kernel per-window cost anatomy (round 4).

r4_winsize measured per-window cost nearly FLAT in window content
(wr=8: 343 ns, wr=4: 287 ns) — the er-loop A-build is NOT the floor
anymore; something per-iteration is.  Lesions (deliberately wrong
outputs except `full`):
  noop   DMA ring + loop + upd with constant res  -> pure iteration cost
  prep   + lpid/head/hi3/lo7/cvs window prep       -> prep cost
  full   + er-loop (A/C builds + dots)             -> the real kernel
  nodma  full compute, DMAs never issued           -> DMA-side cost
"""
import sys, pathlib, os
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
PAY_PLANES = 3  # production pay_bits=24
NPLANES = 4 + PAY_PLANES
as_i32 = lambda x: jax.lax.bitcast_convert_type(
    x.astype(jnp.uint32), jnp.int32).reshape(-1, LANES)
spi, sdi, syi = as_i32(sp), as_i32(sd), as_i32(sy)


def make_kernel(WR, variant, cumwin, wrowtile, NROWS):
    def kern(cumwin_ref, wrowtile_ref, *rest):
        (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
         wpid, wdep, wpay, sems) = rest
        prog = pl.program_id(0)
        bias = jnp.int32(-0x80000000)
        maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
        sr8 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
        flat = (jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 1))
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        t0 = prog * TPS
        lo_w = cumwin_ref[t0]
        hi_w = cumwin_ref[t0 + TPS]

        def dma(g, slot):
            r0 = jnp.minimum(wrowtile_ref[g] >> pm.TPS_BITS, NROWS - WR)
            return [
                pltpu.make_async_copy(spid_hbm.at[pl.ds(r0, WR), :],
                                      wpid.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(spay_hbm.at[pl.ds(r0, WR), :],
                                      wpay.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(sdep_hbm.at[pl.ds(r0, WR), :],
                                      wdep.at[slot], sems.at[slot, 2]),
            ]

        if variant != "nodma":
            for rr in range(RING):
                @pl.when(lo_w + rr < hi_w)
                def _fill(rr=rr):
                    for c in dma(lo_w + rr, rr):
                        c.start()

        def shift_down1(x):
            a = pltpu.roll(x, shift=1, axis=1)
            b = pltpu.roll(a, shift=1, axis=0)
            col = jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 1)
            return jnp.where(col == 0, b, a)

        def one(g, slot):
            if variant != "nodma":
                for c in dma(g, slot):
                    c.wait()
            lt = wrowtile_ref[g] & (TPS - 1)
            if variant == "noop":
                return (lt, (wpid[slot] & 1) == 0, wdep[slot], wpay[slot])
            lpid = wpid[slot] - (t0 + lt) * TILE
            depv = wdep[slot] ^ bias
            payv = wpay[slot] ^ bias
            prev = shift_down1(lpid)
            head = ((lpid != prev) | (flat == 0)) & (lpid >= 0) & (
                lpid < TILE)
            hi3 = jnp.where(head, jnp.right_shift(lpid, 7), -1)
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
            if variant == "prep":
                acc0 = hi3 | cvs[0]
                for q in range(1, len(cvs)):
                    acc0 = acc0 ^ cvs[q]
                return (lt, head, acc0, lo7)
            bc = lambda x, er: jax.lax.broadcast_in_dim(
                x[er:er + 1, :], (SUBS, LANES), (0, 1))
            bcl = lambda x, er: jax.lax.broadcast_in_dim(
                x[er:er + 1, :], (LANES, LANES), (0, 1))
            OUT = None
            for er in range(WR):
                C = (bcl(lo7, er) == sub_iota).astype(jnp.bfloat16)
                m8 = (bc(hi3, er) == sr8).astype(jnp.bfloat16)
                rows = [m8 * bc(cvs[q], er).astype(jnp.bfloat16)
                        for q in range(NPLANES)]
                A = jnp.concatenate(rows, axis=0)
                d_ = jax.lax.dot_general(
                    A, C, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                OUT = d_ if OUT is None else OUT + d_
            conv = OUT.astype(jnp.int32)
            pls = [conv[q * SUBS:(q + 1) * SUBS, :] for q in range(NPLANES)]
            hit = pls[3] != 0
            b3 = pls[3] - hit.astype(jnp.int32)
            cd = pls[0] | (pls[1] << 8) | (pls[2] << 16) | (b3 << 24)
            zero = jnp.zeros((SUBS, LANES), jnp.int32)
            pp = pls[4:] + [zero] * (3 - PAY_PLANES)
            cp = (pp[0] | (pp[1] << 8) | (pp[2] << 16)
                  | jnp.int32(-0x80000000))
            return lt, hit, cd, cp

        def upd(best, res):
            lt, hit, cd, cp = res
            out = []
            for kk in range(TPS):
                bd, bp = best[2 * kk], best[2 * kk + 1]
                take = (lt == kk) & hit & (
                    (cd < bd) | ((cd == bd) & (cp < bp)))
                out.append(jnp.where(take, cd, bd))
                out.append(jnp.where(take, cp, bp))
            return tuple(out)

        def body2(k, best):
            g = lo_w + k
            s = jax.lax.rem(g - lo_w, RING)
            res = one(g, s)

            if variant != "nodma":
                @pl.when(g + RING < hi_w)
                def _pf():
                    for c in dma(g + RING, s):
                        c.start()
            return upd(best, res)

        init = (maxi,) * (2 * TPS)
        out = jax.lax.fori_loop(0, hi_w - lo_w, body2, init)
        for kk in range(TPS):
            outp_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk + 1] ^ bias
            outd_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk] ^ bias

    return kern


def run(variant: str):
    WR = SUBS
    cumwin, wrowtile, NROWS, NPROG = jax.block_until_ready(
        pm.build_rows_window_table(sp, SIZE, wide=1, clip=pm.CLIP_TILES,
                                   tile_cols=wt_cols, win_rows=WR))
    nw = int(np.asarray(cumwin)[-1])
    kern = make_kernel(WR, variant, cumwin, wrowtile, NROWS)
    ntiles_pad = NPROG * TPS
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, WR, LANES), jnp.int32)

    def call(sdv):
        return pl.pallas_call(
            kern, grid=(NPROG,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[outspec] * 2, out_shape=[outshape] * 2,
            scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
        )(cumwin, wrowtile, spi, sdv, syi)

    def sample(x):
        f = x.reshape(-1)
        return jnp.bitwise_xor.reduce(
            f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))

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
        o, jnp.uint32).reshape(ntiles_pad * TILE)[:SIZE]
    if variant == "full":
        outd, outp = call(sdi)
        ok = (np.array_equal(np.asarray(tou32(outd)), gt_d)
              and np.array_equal(np.asarray(tou32(outp)), gt_p))
        tag = " [OK]" if ok else " [FAIL]"
    else:
        tag = " (lesion)"
    print(f"{variant:6s}  windows {nw:6d}  {ms:8.2f} ms{tag}", flush=True)


for v in ("noop", "prep", "full", "nodma"):
    run(v)
