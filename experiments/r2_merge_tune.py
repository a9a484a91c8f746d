"""Merge-kernel ablation: which part of the per-window cost dominates?

Variants (same DMA/table structure as pallas_merge._merge_nk1_kernel):
  full      - suffix-min + 10 probes + reads
  nosuffix  - skip suffix-min (WRONG results; timing only)
  noprobe   - skip binary search, hit everything at pos 0 (timing only)
  dmaonly   - wait DMAs, trivial compute (timing only)
Run on the bench scene's real post-collapse nk1-sorted stream.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcrhpg24_tpu.render import pallas_merge as M
from pcrhpg24_tpu.render.pallas_merge import (
    TILE, LANES, SUBS, TPS, RING, _rows_of, _flat_gather, _suffix_min_u64)


def mk_kernel(mode):
    def kern(cumwin_ref, wrow_ref, wtile_ref, *rest, nrows: int):
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
            r0 = jnp.minimum(wrow_ref[g], nrows - SUBS)
            return [
                pltpu.make_async_copy(spid_hbm.at[pl.ds(r0, SUBS), :], wpid.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(spay_hbm.at[pl.ds(r0, SUBS), :], wpay.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(sdep_hbm.at[pl.ds(r0, SUBS), :], wdep.at[slot], sems.at[slot, 2]),
            ]

        for r in range(RING):
            @pl.when(lo + r < hi)
            def _fill(r=r):
                for c in dma(lo + r, r):
                    c.start()

        def body2(g, best):
            bd0, bp0, bd1, bp1, bd2, bp2, bd3, bp3 = best
            slot = jax.lax.rem(g - lo, RING)
            for c in dma(g, slot):
                c.wait()
            lt = wtile_ref[g] - t0
            lpid = wpid[slot] - (t0 + lt) * TILE
            if mode == "dmaonly":
                cd = wdep[slot]; cp = wpay[slot]; hit = lpid == iota
            else:
                if mode == "nosuffix":
                    dep, pay = wdep[slot] ^ bias, wpay[slot] ^ bias
                else:
                    dep, pay = _suffix_min_u64(lpid, wdep[slot] ^ bias, wpay[slot] ^ bias)
                pidrows = _rows_of(lpid)
                if mode == "noprobe":
                    posc = jnp.zeros((SUBS, LANES), jnp.int32)
                else:
                    pos = jnp.zeros((SUBS, LANES), jnp.int32)
                    for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                        probe = _flat_gather(pidrows, pos + (b - 1))
                        pos = pos + (probe < iota).astype(jnp.int32) * b
                    posc = jnp.minimum(pos, TILE - 1)
                hit = _flat_gather(pidrows, posc) == iota
                cd = _flat_gather(_rows_of(dep), posc)
                cp = _flat_gather(_rows_of(pay), posc)

            @pl.when(g + RING < hi)
            def _prefetch():
                for c in dma(g + RING, slot):
                    c.start()

            def upd(bd, bp, k):
                mine = lt == k
                less = (cd < bd) | ((cd == bd) & (cp < bp))
                take = mine & hit & less
                return jnp.where(take, cd, bd), jnp.where(take, cp, bp)

            bd0, bp0 = upd(bd0, bp0, 0)
            bd1, bp1 = upd(bd1, bp1, 1)
            bd2, bp2 = upd(bd2, bp2, 2)
            bd3, bp3 = upd(bd3, bp3, 3)
            return bd0, bp0, bd1, bp1, bd2, bp2, bd3, bp3

        init = (maxi,) * 8
        out = jax.lax.fori_loop(lo, hi, body2, init)
        for k in range(TPS):
            outp_ref[k * SUBS : (k + 1) * SUBS, :] = out[2 * k + 1] ^ bias
            outd_ref[k * SUBS : (k + 1) * SUBS, :] = out[2 * k] ^ bias
    return kern


@partial(jax.jit, static_argnames=("size", "mode"))
def run(spid, sdep, spay, size: int, mode: str):
    n = spid.shape[0]
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    bounds = jnp.arange(ntiles_pad + 1, dtype=jnp.uint32) * TILE
    starts = jnp.searchsorted(spid, bounds).astype(jnp.int32)
    s0, s1 = starts[:-1], starts[1:]
    first_row = s0 // LANES
    span = s1 - first_row * LANES
    nwin = jnp.where(s1 > s0, (span + TILE - 1) // TILE, 0)
    wmax = n // TILE + ntiles_pad
    cumwin = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nwin, dtype=jnp.int32)])
    gidx = jnp.arange(wmax, dtype=jnp.int32)
    wtile = jnp.clip(jnp.searchsorted(cumwin, gidx, side="right").astype(jnp.int32) - 1, 0, ntiles_pad - 1)
    wrow = jnp.take(first_row, wtile) + (gidx - jnp.take(cumwin, wtile)) * SUBS
    as_i32 = lambda x: jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32).reshape(n // LANES, LANES)
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)
    outs = pl.pallas_call(
        partial(mk_kernel(mode), nrows=n // LANES),
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[outspec] * 2, out_shape=[outshape] * 2,
        scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
    )(cumwin, wrow, wtile, as_i32(spid), as_i32(sdep), as_i32(spay))
    return outs


from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu, render_chunk_native

W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create("out/bench_64.tpc")
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale, offset_rel,
    W, H, "color", fmt="fixed")
spid, sdep, spay = jax.lax.sort(
    [pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)
spid, sdep, spay = jax.block_until_ready((spid, sdep, spay))
SIZE = W * H
nreal = int((np.asarray(spid) < SIZE).sum())
print(f"real entries {nreal}, full windows ~{nreal//1024}", flush=True)

def slope(mode):
    @functools.partial(jax.jit, static_argnames=("k", "mode"))
    def chain(a, k, mode):
        acc = jnp.int32(0)
        for _ in range(k):
            outs = run(a, sdep, spay, SIZE, mode)
            probe = outs[0][0, 0]
            a = a + jnp.where(probe == 123456789, 1, 0).astype(a.dtype)
            acc += probe
        return acc
    ts = {}
    for k in (1, 4):
        float(chain(spid, k=k, mode=mode))
        t0 = time.perf_counter(); float(chain(spid, k=k, mode=mode))
        ts[k] = time.perf_counter() - t0
    return (ts[4] - ts[1]) / 3 * 1e3

for mode in (sys.argv[1:] or ("full", "nosuffix", "noprobe", "dmaonly")):
    print(f"{mode:9s}: {slope(mode):7.2f} ms", flush=True)
