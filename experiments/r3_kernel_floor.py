"""Merge-kernel cost anatomy: what do the 4.47 ms actually buy?

Variants on the real bench stream (device-trace timed):
  floor    DMAs + loop only (no compute, bogus output)
  +suffix  adds the 5-step segmented suffix-min
  +probes  adds the 10-probe binary search (full kernel, current)
  1dma     full kernel but pid/dep/pay interleaved per window row-block
           (one (24,128) DMA instead of three (8,128) DMAs)

Only `+probes` (== current) is exactness-gated; the others are
deliberately wrong and only measure op groups.
"""
import sys, pathlib, functools, os
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

cumwin, wrowtile, nrows, nprog = jax.block_until_ready(
    pm.build_rows_window_table(sp, SIZE, wide=pm.ILP_WIDE,
                               clip=pm.CLIP_TILES, tile_cols=wt_cols))
TPS, SUBS, LANES, RING, WIDE = pm.TPS, pm.SUBS, pm.LANES, pm.RING, pm.ILP_WIDE
ntiles_pad = nprog * TPS
as_i32 = lambda x: jax.lax.bitcast_convert_type(
    x.astype(jnp.uint32), jnp.int32).reshape(-1, LANES)
spi, sdi, syi = as_i32(sp), as_i32(sd), as_i32(sy)
print("windows", int(np.asarray(cumwin)[-1]), "nprog", nprog, flush=True)


def make_kernel(mode: str, steps: int = 5):
    def kern(cumwin_ref, wrowtile_ref, *rest):
        (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
         wpid, wdep, wpay, sems) = rest
        prog = pl.program_id(0)
        bias = jnp.int32(-0x80000000)
        maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
        iota = (jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1))
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
            if mode == "floor":
                return lt, lpid > 0, wdep[slot], wpay[slot]
            depv, payv = pm._suffix_min_u64(
                lpid, wdep[slot] ^ bias, wpay[slot] ^ bias, steps)
            if mode == "suffix":
                return lt, lpid > 0, depv, payv
            pidrows = pm._rows_of(lpid)
            pos = jnp.zeros((SUBS, LANES), jnp.int32)
            for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                probe = pm._flat_gather(pidrows, pos + (b - 1))
                pos = pos + (probe < iota).astype(jnp.int32) * b
            posc = jnp.minimum(pos, 1024 - 1)
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


def run_variant(mode, label, check=False):
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)
    kern = make_kernel(mode)

    def call(sdv):
        return pl.pallas_call(
            kern, grid=(nprog,),
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
    tag = ""
    if check:
        tou32 = lambda o: jax.lax.bitcast_convert_type(
            o, jnp.uint32).reshape(ntiles_pad * 1024)[:SIZE]
        outd, outp = call(sdi)
        ok = (np.array_equal(np.asarray(tou32(outd)), gt_d)
              and np.array_equal(np.asarray(tou32(outp)), gt_p))
        tag = " [OK]" if ok else " [FAIL]"
    print(f"{label:28s} {ms:8.2f} ms{tag}", flush=True)
    return ms


run_variant("floor", "floor (DMA+loop only)")
run_variant("suffix", "+suffix-min (5 steps)")
run_variant("full", "+probes (== current)", check=True)
