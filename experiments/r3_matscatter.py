"""Scatter-matmul merge kernel over FULL-KEY sorted rows.

r3_kernel_floor anatomy: floor (DMA+loop) 0.31 ms, +suffix-min 1.78,
+probes 4.48 — the kernel is pure serial-latency: the suffix-min and
the 10-probe binary search are both dependency chains on single vregs,
and ILP_WIDE=2 only lets the two chains hide each other (r3_fullsort:
removing the suffix alone saved nothing).

This variant removes BOTH chains at once:
  * rows sort by the FULL key (pid, dep, pay) — the first entry of
    every pid run is its exact u64 min (costs +0.56 ms at 128x32K,
    r3_fullsort), so no suffix-min is needed;
  * per window, winners scatter to pixels via a head-masked factorized
    one-hot MXU matmul instead of the per-pixel binary search:
        OUT[pr, pc] = sum_k head[k] * (hi[k]==pr) * (lo[k]==pc) * V[k]
    with hi = lpid>>7 (sublane one-hot, LHS), lo = lpid&127 (lane
    one-hot, RHS via one (8,128)->(128,8) transpose), and V split into
    4 bytes per plane so bf16 products are exact (one contributor per
    pixel per window: head-masked runs are unique).
  All ops are parallel-schedulable; the MXU (idle in the probe kernel)
  carries the scatter.

Run: python experiments/r3_matscatter.py
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

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
p2, d2, y2 = (pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
              dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n))
# full-key sort: first entry of each pid run is the exact u64 min
sp, sd, sy = jax.block_until_ready(jax.lax.sort(
    [p2, d2, y2], num_keys=3, is_stable=False, dimension=1))
gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))
gt_d, gt_p = np.asarray(gt_d), np.asarray(gt_p)

TPS, SUBS, LANES, RING = pm.TPS, pm.SUBS, pm.LANES, pm.RING
as_i32 = lambda x: jax.lax.bitcast_convert_type(
    x.astype(jnp.uint32), jnp.int32).reshape(-1, LANES)
spi, sdi, syi = as_i32(sp), as_i32(sd), as_i32(sy)


def _shift_down1(x):
    """prev[k] = x[k-1] over the (8,128) row-major flat order (circular
    at k=0, which callers head-force anyway)."""
    a = pltpu.roll(x, shift=1, axis=1)
    b = pltpu.roll(a, shift=1, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    return jnp.where(col == 0, b, a)


def make_matscatter(wide: int, loop_dots: bool):
    """Scatter-matmul kernel; `loop_dots` accumulates 8 small dots
    (lower vreg pressure) instead of one concatenated (64,1024) dot."""

    def kern(cumwin_ref, wrowtile_ref, *rest):
        (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
         wpid, wdep, wpay, sems) = rest
        prog = pl.program_id(0)
        bias = jnp.int32(-0x80000000)
        maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
        sr8 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
        flat = sr8 * LANES + jax.lax.broadcasted_iota(
            jnp.int32, (SUBS, LANES), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        t0 = prog * TPS
        lo_w = cumwin_ref[t0]
        hi_w = cumwin_ref[t0 + TPS]
        nrows_c = NROWS

        def dma(g, slot):
            r0 = jnp.minimum(wrowtile_ref[g] >> pm.TPS_BITS, nrows_c - SUBS)
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
            lt = wrowtile_ref[g] & (TPS - 1)
            lpid = wpid[slot] - (t0 + lt) * 1024
            prev = _shift_down1(lpid)
            head = ((lpid != prev) | (flat == 0)) & (lpid >= 0) & (lpid < 1024)
            depv = wdep[slot] ^ bias
            payv = wpay[slot] ^ bias
            hi3 = jnp.right_shift(lpid, 7)
            lo7 = jnp.bitwise_and(lpid, 127)
            loT = jnp.transpose(lo7)  # (128, 8)
            Bs = [
                (jax.lax.broadcast_in_dim(
                    loT[:, er:er + 1], (LANES, LANES), (0, 1)) == lane_iota
                 ).astype(jnp.bfloat16)
                for er in range(SUBS)
            ]
            du = jax.lax.bitcast_convert_type(depv, jnp.uint32)
            pu = jax.lax.bitcast_convert_type(payv, jnp.uint32)
            cvs = [
                jnp.bitwise_and(jnp.right_shift(du, 8 * q),
                                jnp.uint32(255)).astype(jnp.int32)
                for q in range(4)
            ] + [
                jnp.bitwise_and(jnp.right_shift(pu, 8 * q),
                                jnp.uint32(255)).astype(jnp.int32)
                for q in range(4)
            ]
            bc = lambda x, er: jax.lax.broadcast_in_dim(
                x[er:er + 1, :], (SUBS, LANES), (0, 1))
            A_blocks = []
            for er in range(SUBS):
                m8 = ((bc(hi3, er) == sr8) & bc(head, er)).astype(
                    jnp.bfloat16)
                rows = [m8 * bc(cvs[q], er).astype(jnp.bfloat16)
                        for q in range(8)]
                A_blocks.append(jnp.concatenate(rows, axis=0))  # (64,128)
            if loop_dots:
                OUT = jax.lax.dot_general(
                    A_blocks[0], Bs[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for er in range(1, SUBS):
                    OUT = OUT + jax.lax.dot_general(
                        A_blocks[er], Bs[er], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            else:
                A = jnp.concatenate(A_blocks, axis=1)      # (64, 1024)
                B = jnp.concatenate(Bs, axis=0)            # (1024, 128)
                OUT = jax.lax.dot_general(
                    A, B, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (64, 128)
            conv = OUT.astype(jnp.int32)
            pls = [conv[q * 8:(q + 1) * 8, :] for q in range(8)]
            cd = (pls[0] | (pls[1] << 8) | (pls[2] << 16) | (pls[3] << 24))
            cp = (pls[4] | (pls[5] << 8) | (pls[6] << 16) | (pls[7] << 24))
            hit = pls[3] != 0
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
            g0 = lo_w + wide * k
            ress = []
            for j in range(wide):
                g = g0 + j
                s = jax.lax.rem(g - lo_w, RING)
                ress.append(one(g, s))

                @pl.when(g + RING < hi_w)
                def _pf(g=g, s=s):
                    for c in dma(g + RING, s):
                        c.start()
            for res in ress:
                best = upd(best, res)
            return best

        init = (maxi,) * (2 * TPS)
        out = jax.lax.fori_loop(
            0, jax.lax.div(hi_w - lo_w, wide), body2, init)
        for kk in range(TPS):
            outp_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk + 1] ^ bias
            outd_ref[kk * SUBS:(kk + 1) * SUBS, :] = out[2 * kk] ^ bias

    return kern


def run_variant(kern, wide, label, check=True):
    cumwin, wrowtile, nrows, nprog = jax.block_until_ready(
        pm.build_rows_window_table(sp, SIZE, wide=wide,
                                   clip=pm.CLIP_TILES, tile_cols=wt_cols))
    global NROWS
    NROWS = nrows
    ntiles_pad = nprog * TPS
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)

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
    print(f"{label:34s} {ms:8.2f} ms{tag}", flush=True)
    return ms


NROWS = 0
print("windows(base)", flush=True)
# baseline: production ILP kernel with suffix_steps=0 on nk3 rows
base = partial(pm._merge_nk1_kernel_ilp, nrows=0, wide=pm.ILP_WIDE,
               suffix_steps=0)


def run_baseline():
    cumwin, wrowtile, nrows, nprog = jax.block_until_ready(
        pm.build_rows_window_table(sp, SIZE, wide=pm.ILP_WIDE,
                                   clip=pm.CLIP_TILES, tile_cols=wt_cols))
    ntiles_pad = nprog * TPS
    print("windows", int(np.asarray(cumwin)[-1]), "nprog", nprog, flush=True)
    kern = partial(pm._merge_nk1_kernel_ilp, nrows=nrows, wide=pm.ILP_WIDE,
                   suffix_steps=0)
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)

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
    tou32 = lambda o: jax.lax.bitcast_convert_type(
        o, jnp.uint32).reshape(ntiles_pad * 1024)[:SIZE]
    outd, outp = call(sdi)
    ok = (np.array_equal(np.asarray(tou32(outd)), gt_d)
          and np.array_equal(np.asarray(tou32(outp)), gt_p))
    print(f"{'probe kernel, nk3, steps=0':34s} {ms:8.2f} ms"
          f"{' [OK]' if ok else ' [FAIL]'}", flush=True)


# sort cost context (device-traced on the real streams)
for nk, lab in ((1, "sort nk1"), (3, "sort nk3")):
    @jax.jit
    def schain(nk=nk):
        acc = jnp.uint32(0)
        a, b, c = p2, d2, y2
        for _ in range(4):
            a = a ^ (acc & jnp.uint32(1))
            ss = jax.lax.sort([a, b, c], num_keys=nk, is_stable=False,
                              dimension=1)
            acc = acc ^ ss[0][0, 0] ^ ss[1][-1, -1]
        return acc
    jax.block_until_ready(schain())
    print(f"{lab:34s} {device_ms(schain, key='jit_schain') / 4:8.2f} ms",
          flush=True)

run_baseline()
run_variant(make_matscatter(1, False), 1, "matscatter wide=1 one-dot")
run_variant(make_matscatter(2, False), 2, "matscatter wide=2 one-dot")
run_variant(make_matscatter(1, True), 1, "matscatter wide=1 loop-dots")
run_variant(make_matscatter(2, True), 2, "matscatter wide=2 loop-dots")
