"""Scatter-free HQS accumulation: segmented suffix-SUM merge kernel.

The reference's HQS color pass accumulates per-pixel (r,g,b,count) sums
with two 64-bit atomicAdds after a depth-tolerance test
(modules/huffman_hqs/render.cu:274-316).  XLA's TPU scatter-add runs at
~4.8 ns/slot, making an HQS frame ~80 ms at 4M points.  This kernel
reuses the nk1 sorted-stream architecture of pallas_merge: per
1024-entry window of the pid-sorted stream,

  * the depth-tolerance accept test (depth <= fb_depth[pixel] * 1.01)
    runs in-register: the dense depth plane's tile block is an input,
    and fb_depth[lpid] is one flat-gather — no HBM gather pass;
  * rejected entries zero their contribution; accepted ones unpack
    r/g/b from the BC1 payload;
  * a segmented suffix-sum (segments = pid runs, log2(1024) roll-add
    steps) makes the entry at lower_bound(pid) carry the run's sums;
  * per-pixel sums ADD across windows (sums are associative — no
    cross-window carry needed, mirroring the min-merge argument).

Output: four dense planes (acc_r, acc_g, acc_b, acc_n) u32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_merge import (
    LANES,
    RING,
    SUBS,
    TILE,
    TPS,
    TPS_BITS,
    _flat_gather,
    _flat_shift,
    _rows_of,
    _search_lower_bound,
)


def _suffix_sum_segmented(lpid, vals, steps: int = 10):
    """Segmented suffix-sums of each plane in `vals`; segments = lpid runs.

    Unlike the min-merge (where the circular-roll wrap is idempotent),
    sums must NOT wrap: a whole-window single run would double-count.
    Each step masks positions whose shifted partner wrapped past the
    window end.  `steps` doubling steps complete runs up to 2**steps —
    callers verify the bound on device (pallas_merge._runs_bounded) and
    fall back to the full 10 via lax.cond.
    """
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )
    s = 1
    while s < (1 << steps):
        rl = _flat_shift(lpid, s)
        valid = (rl == lpid) & (flat < TILE - s)
        vals = [
            v + jnp.where(valid, _flat_shift(v, s), 0) for v in vals
        ]
        s *= 2
    return vals


def _hqs_sum_kernel(cumwin_ref, wrowtile_ref, *rest, nrows: int,
                    suffix_steps: int = 10):
    (spid_hbm, sdep_hbm, spay_hbm, fbd_ref,
     outr_ref, outg_ref, outb_ref, outn_ref,
     wpid, wdep, wpay, sems) = rest
    # packed window word: row << (TPS_BITS+3) | reread_rows << TPS_BITS
    # | local tile (rows are pre-clamped per stream at table build)
    prog = pl.program_id(0)
    zero = jnp.zeros((SUBS, LANES), jnp.int32)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )
    t0 = prog * TPS
    lo = cumwin_ref[t0]
    hi = cumwin_ref[t0 + TPS]

    def dma(g, slot):
        r0 = jnp.minimum(wrowtile_ref[g] >> (TPS_BITS + 3), nrows - SUBS)
        return [
            pltpu.make_async_copy(
                spid_hbm.at[pl.ds(r0, SUBS), :], wpid.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                spay_hbm.at[pl.ds(r0, SUBS), :], wpay.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                sdep_hbm.at[pl.ds(r0, SUBS), :], wdep.at[slot], sems.at[slot, 2]
            ),
        ]

    for r in range(RING):
        @pl.when(lo + r < hi)
        def _fill(r=r):
            for c in dma(lo + r, r):
                c.start()

    # tolerance accept: depth <= fb_depth * 1.01 in f32, exactly as the
    # reference (huffman_hqs/render.cu:296).  fb_depth EMPTY (0xFFFFFFFF)
    # bitcasts to NaN -> compare false -> rejected, matching the
    # reference's cleared-buffer behavior.
    fbd_rows = [_rows_of(fbd_ref[k * SUBS : (k + 1) * SUBS, :]) for k in range(TPS)]

    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )

    def body(g, acc):
        slot = jax.lax.rem(g - lo, RING)
        for c in dma(g, slot):
            c.wait()
        lt = wrowtile_ref[g] & (TPS - 1)
        lpid = wpid[slot] - (t0 + lt) * TILE
        lpid_c = jnp.clip(lpid, 0, TILE - 1)

        fbd_here = _flat_gather(fbd_rows[0], lpid_c)
        for k in range(1, TPS):
            fbd_here = jnp.where(
                lt == k, _flat_gather(fbd_rows[k], lpid_c), fbd_here
            )
        old = jax.lax.bitcast_convert_type(fbd_here, jnp.float32)
        w = jax.lax.bitcast_convert_type(wdep[slot], jnp.float32)
        # the end-of-stream clamp re-reads rows already covered by this
        # tile's previous window; unlike the min-merge, sums must drop
        # those re-read leading entries (count packed at table build)
        reread = ((wrowtile_ref[g] >> TPS_BITS) & 7) * LANES
        keep = (
            (lpid == lpid_c)  # in this tile's pixel range
            & (flat >= reread)
            & (w <= old * jnp.float32(1.01))
        )
        pay = wpay[slot]
        rr = jnp.where(keep, pay & 0xFF, 0)
        gg = jnp.where(keep, (pay >> 8) & 0xFF, 0)
        bb = jnp.where(keep, (pay >> 16) & 0xFF, 0)
        nn = keep.astype(jnp.int32)
        rr, gg, bb, nn = _suffix_sum_segmented(lpid, [rr, gg, bb, nn],
                                               suffix_steps)

        pidrows = _rows_of(lpid)
        pos = _search_lower_bound(lpid, pidrows, iota)
        posc = jnp.minimum(pos, TILE - 1)
        hit = _flat_gather(pidrows, posc) == iota

        @pl.when(g + RING < hi)
        def _prefetch():
            for c in dma(g + RING, slot):
                c.start()

        got = [
            jnp.where(hit, _flat_gather(_rows_of(v), posc), 0)
            for v in (rr, gg, bb, nn)
        ]
        # route this window's sums to its tile's accumulators
        return tuple(
            acc[k * 4 + j] + jnp.where(lt == k, got[j], 0)
            for k in range(TPS) for j in range(4)
        )

    # `hit` matches only pixels of tile (t0+lt); windows of one tile are
    # TILE-strided from first_row so they never overlap within a tile
    # (except the end-of-stream clamp, masked via `reread` above), and
    # foreign-tile entries fail the lpid range check — so per-pixel sums
    # across windows add each entry exactly once.
    acc = jax.lax.fori_loop(lo, hi, body, (zero,) * (4 * TPS))
    for k in range(TPS):
        sl = slice(k * SUBS, (k + 1) * SUBS)
        outr_ref[sl, :] = acc[k * 4 + 0]
        outg_ref[sl, :] = acc[k * 4 + 1]
        outb_ref[sl, :] = acc[k * 4 + 2]
        outn_ref[sl, :] = acc[k * 4 + 3]


def _hqs_matscatter_kernel(cumwin_ref, wrowtile_ref, *rest, nrows: int):
    """MXU scatter-matmul HQS sum kernel (round 4).

    The probe+suffix-sum kernel above costs ~1.45 us/window (binary
    search + 10 segmented roll-add steps per plane are serial chains);
    SUMS are the natural one-hot matmul case — no head masking, no
    search: every accepted entry contributes its (r, g, b, 1) through
    the factorized one-hot scatter

        OUT[q, pr, pc] = sum_k accept[k] (hi[k]==pr)(lo[k]==pc) V_q[k]

    with the accept mask (tile range + reread drop + depth tolerance)
    folded into the sublane index like matscatter's head fold.  All
    products are bf16-exact (bytes), per-window per-pixel sums stay
    < 2^18 so the f32 accumulation is exact, and i32 adds across
    windows match the old kernel bit-for-bit.  ~0.4 us/window
    (experiments/r4_hqs_parts.py: blend 8.15 -> see NOTES).
    """
    (spid_hbm, sdep_hbm, spay_hbm, fbd_ref,
     outr_ref, outg_ref, outb_ref, outn_ref,
     wpid, wdep, wpay, sems) = rest
    prog = pl.program_id(0)
    zero = jnp.zeros((SUBS, LANES), jnp.int32)
    sr8 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
    flat = sr8 * LANES + jax.lax.broadcasted_iota(
        jnp.int32, (SUBS, LANES), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    t0 = prog * TPS
    lo_w = cumwin_ref[t0]
    hi_w = cumwin_ref[t0 + TPS]

    def dma(g, slot):
        r0 = jnp.minimum(wrowtile_ref[g] >> (TPS_BITS + 3), nrows - SUBS)
        return [
            pltpu.make_async_copy(
                spid_hbm.at[pl.ds(r0, SUBS), :], wpid.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                spay_hbm.at[pl.ds(r0, SUBS), :], wpay.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                sdep_hbm.at[pl.ds(r0, SUBS), :], wdep.at[slot],
                sems.at[slot, 2]),
        ]

    for r in range(RING):
        @pl.when(lo_w + r < hi_w)
        def _fill(r=r):
            for c in dma(lo_w + r, r):
                c.start()

    from .pallas_merge import _rows_of

    fbd_rows = [_rows_of(fbd_ref[k * SUBS:(k + 1) * SUBS, :])
                for k in range(TPS)]

    def one(g, slot):
        for c in dma(g, slot):
            c.wait()
        lt = wrowtile_ref[g] & (TPS - 1)
        lpid = wpid[slot] - (t0 + lt) * TILE
        lpid_c = jnp.clip(lpid, 0, TILE - 1)
        fbd_here = _flat_gather(fbd_rows[0], lpid_c)
        for k in range(1, TPS):
            fbd_here = jnp.where(
                lt == k, _flat_gather(fbd_rows[k], lpid_c), fbd_here)
        old = jax.lax.bitcast_convert_type(fbd_here, jnp.float32)
        w = jax.lax.bitcast_convert_type(wdep[slot], jnp.float32)
        reread = ((wrowtile_ref[g] >> TPS_BITS) & 7) * LANES
        accept = ((lpid == lpid_c) & (flat >= reread)
                  & (w <= old * jnp.float32(1.01)))
        hi3 = jnp.where(accept, jnp.right_shift(lpid_c, 7), -1)
        lo7 = jnp.bitwise_and(lpid_c, LANES - 1)
        pay = wpay[slot]
        cvs = [
            jnp.bitwise_and(pay, 255),
            jnp.bitwise_and(jnp.right_shift(pay, 8), 255),
            jnp.bitwise_and(jnp.right_shift(pay, 16), 255),
            jnp.full((SUBS, LANES), 1, jnp.int32),
        ]
        bc = lambda x, er: jax.lax.broadcast_in_dim(
            x[er:er + 1, :], (SUBS, LANES), (0, 1))
        bcl = lambda x, er: jax.lax.broadcast_in_dim(
            x[er:er + 1, :], (LANES, LANES), (0, 1))
        OUT = None
        for er in range(SUBS):
            C = (bcl(lo7, er) == sub_iota).astype(jnp.bfloat16)
            m8 = (bc(hi3, er) == sr8).astype(jnp.bfloat16)
            rows = [m8 * bc(cvs[q], er).astype(jnp.bfloat16)
                    for q in range(4)]
            A = jnp.concatenate(rows, axis=0)  # (32, 128)
            d = jax.lax.dot_general(
                A, C, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            OUT = d if OUT is None else OUT + d
        conv = OUT.astype(jnp.int32)
        return lt, [conv[q * SUBS:(q + 1) * SUBS, :] for q in range(4)]

    def body(g, acc):
        slot = jax.lax.rem(g - lo_w, RING)
        lt, got = one(g, slot)

        @pl.when(g + RING < hi_w)
        def _prefetch():
            for c in dma(g + RING, slot):
                c.start()

        return tuple(
            acc[k * 4 + j] + jnp.where(lt == k, got[j], 0)
            for k in range(TPS) for j in range(4)
        )

    acc = jax.lax.fori_loop(lo_w, hi_w, body, (zero,) * (4 * TPS))
    for k in range(TPS):
        sl = slice(k * SUBS, (k + 1) * SUBS)
        outr_ref[sl, :] = acc[k * 4 + 0]
        outg_ref[sl, :] = acc[k * 4 + 1]
        outb_ref[sl, :] = acc[k * 4 + 2]
        outn_ref[sl, :] = acc[k * 4 + 3]


@partial(jax.jit, static_argnames=("size", "interpret"))
def hqs_sums_from_sorted(spid, sdep, spay, fb_depth, size: int,
                         interpret: bool = False):
    """Single-stream wrapper over hqs_sums_from_sorted_multi."""
    return hqs_sums_from_sorted_multi(
        [(spid, sdep, spay)], fb_depth, size, interpret
    )


@partial(jax.jit, static_argnames=("size", "interpret", "tile_cols"))
def hqs_sums_from_rows(sp2d, sd2d, sy2d, fb_depth, size: int,
                       interpret: bool = False,
                       tile_cols: int | None = None):
    """(S, n) pid-sorted rows + dense fb_depth -> (r, g, b, n) u32 planes.

    Rows variant of hqs_sums_from_sorted_multi built on the gather-free
    window-table expansion (pallas_merge.build_rows_window_table with a
    3-bit reread field): each row is an independently pid-ascending
    stream whose per-pixel sums ADD across rows.  `fb_depth` must be in
    the same (swizzled) pid space as the streams.  Rows process in
    groups sized to the SMEM table budget; group planes add exactly.
    """
    from .pallas_merge import _SMEM_WORD_BUDGET, build_rows_window_table

    S, n = sp2d.shape
    assert n % TILE == 0, n
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    from .pallas_merge import CLIP_TILES, _clip_fits

    def render(clip):
        words_per_stream = (ntiles_pad if clip is None else clip) + n // TILE
        smax = max(1, (_SMEM_WORD_BUDGET - nprog) // words_per_stream)
        acc = None
        for g0 in range(0, S, smax):
            planes = _hqs_rows_group(
                sp2d[g0:g0 + smax], sd2d[g0:g0 + smax], sy2d[g0:g0 + smax],
                fb_depth, size, interpret, clip, tile_cols,
            )
            acc = planes if acc is None else tuple(
                a + p for a, p in zip(acc, planes)
            )
        return acc

    if CLIP_TILES < ntiles_pad:
        return jax.lax.cond(
            _clip_fits(sp2d, size, CLIP_TILES, tile_cols),
            lambda: render(CLIP_TILES),
            lambda: render(None),
        )
    return render(None)


def _hqs_rows_group(sp2d, sd2d, sy2d, fb_depth, size: int, interpret: bool,
                    clip=None, tile_cols=None):
    """One matscatter-sum kernel call over a row group.

    This rows path always uses the matscatter SUM kernel (no run-length
    bound needed).  The segmented suffix-sum kernel `_hqs_sum_kernel`
    survives ONLY for the non-rows `hqs_sums_from_sorted_multi` path."""
    from .pallas_merge import WCAP, build_rows_window_table

    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    # wcap-bounded table with device-checked fallback (see
    # pallas_merge._dense_rows_group)
    cumwin, wrowtile, nrows, nprog = build_rows_window_table(
        sp2d, size, wide=1, reread_bits=3, clip=clip, tile_cols=tile_cols,
        wcap=WCAP,
    )

    as_i32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    ).reshape(-1, LANES)
    fbd = jnp.pad(
        jax.lax.bitcast_convert_type(fb_depth, jnp.int32),
        (0, ntiles_pad * TILE - size),
        constant_values=-1,
    ).reshape(ntiles_pad * SUBS, LANES)
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)

    def call(tables):
        kern = partial(_hqs_matscatter_kernel, nrows=nrows)
        return pl.pallas_call(
            kern,
            grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3
            + [pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))],
            out_specs=[outspec] * 4,
            out_shape=[outshape] * 4,
            scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
            interpret=interpret,
        )(*tables, as_i32(sp2d), as_i32(sd2d), as_i32(sy2d), fbd)

    def resolve_with(tables):
        return call(tables)

    def big_path():
        cw2, wr2, _nr, _np = build_rows_window_table(
            sp2d, size, wide=1, reread_bits=3, clip=clip,
            tile_cols=tile_cols,
        )
        return resolve_with((cw2, wr2))

    outs = jax.lax.cond(
        cumwin[-1] < WCAP,
        lambda: resolve_with((cumwin, wrowtile)),
        big_path,
    )

    tou32 = lambda o: jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(
        ntiles_pad * TILE
    )[:size]
    return tuple(tou32(o) for o in outs)


@partial(jax.jit, static_argnames=("size", "interpret"))
def hqs_sums_from_sorted_multi(parts, fb_depth, size: int,
                               interpret: bool = False):
    """Per-chunk nk1 pid-sorted (pid, depthbits, rgba) streams + dense
    fb_depth -> (acc_r, acc_g, acc_b, acc_n) u32 planes, reference
    tolerance blend semantics (huffman_hqs/render.cu:274-316).

    Mirrors pallas_merge.dense_from_sorted_nk1_multi's flattened
    per-stream window tables (per-chunk sorts are superlinearly cheaper
    than one global sort); sums add exactly once because each entry
    appears in exactly one window of its tile per stream and the
    clamp-induced re-reads carry their drop count in the packed table.
    Beyond ~200M points the SMEM window table would overflow; streams
    then process in groups whose (r,g,b,n) planes simply add (each
    entry is in exactly one group; the tolerance gate uses the same
    fb_depth everywhere).
    """
    from .pallas_merge import group_streams

    ntiles0 = -(-size // TILE)
    groups = group_streams(parts, (-(-ntiles0 // TPS)) * TPS)
    if len(groups) > 1:
        acc = None
        for g in groups:
            planes = hqs_sums_from_sorted_multi(g, fb_depth, size,
                                                interpret)
            acc = planes if acc is None else tuple(
                a + p for a, p in zip(acc, planes)
            )
        return acc
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    bounds = jnp.arange(ntiles_pad + 1, dtype=jnp.uint32) * TILE

    per_stream = []
    rowoff = 0
    wmax = ntiles_pad * len(parts)
    for spid, _sd, _sp in parts:
        n = spid.shape[0]
        assert n % TILE == 0, n
        starts = jnp.searchsorted(spid, bounds).astype(jnp.int32)
        s0, s1 = starts[:-1], starts[1:]
        first_row = s0 // LANES
        span = s1 - first_row * LANES
        nwin = jnp.where(s1 > s0, (span + TILE - 1) // TILE, 0)
        per_stream.append((first_row + rowoff, nwin, rowoff + n // LANES))
        rowoff += n // LANES
        wmax += n // TILE
    nrows = rowoff
    # local-tile packing (see pallas_merge): 31 - TPS_BITS - 3 = 26 row
    # bits -> ~8.6G points, vs ~16.7M with an absolute-tile field
    assert nrows < (1 << (31 - TPS_BITS - 3)), (
        "scene too large for packed HQS window tables "
        f"({nrows} rows, {ntiles_pad} tiles)"
    )

    nwin_tot = sum(nw for _fr, nw, _e in per_stream)
    cumwin = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nwin_tot, dtype=jnp.int32)]
    )
    gidx = jnp.arange(wmax, dtype=jnp.int32)
    wtile = jnp.clip(
        jnp.searchsorted(cumwin, gidx, side="right").astype(jnp.int32) - 1,
        0, ntiles_pad - 1,
    )
    wloc = gidx - jnp.take(cumwin, wtile)
    wrow = jnp.zeros(wmax, jnp.int32)
    wre = jnp.zeros(wmax, jnp.int32)
    base = jnp.zeros(ntiles_pad, jnp.int32)
    for fr, nw, stream_end in per_stream:
        mine = (wloc >= jnp.take(base, wtile)) & (
            wloc < jnp.take(base + nw, wtile)
        )
        local = wloc - jnp.take(base, wtile)
        row = jnp.take(fr, wtile) + local * SUBS
        rowc = jnp.minimum(row, stream_end - SUBS)
        wrow = jnp.where(mine, rowc, wrow)
        wre = jnp.where(mine, row - rowc, wre)
        base = base + nw
    wrowtile = (
        (wrow << (TPS_BITS + 3)) | (wre << TPS_BITS) | (wtile & (TPS - 1))
    )

    cat = lambda arrs: jnp.concatenate(arrs) if len(arrs) > 1 else arrs[0]
    as_i32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    ).reshape(-1, LANES)
    spid_all = as_i32(cat([p for p, _d, _y in parts]))
    sdep_all = as_i32(cat([d for _p, d, _y in parts]))
    spay_all = as_i32(cat([y for _p, _d, y in parts]))

    fbd = jnp.pad(
        jax.lax.bitcast_convert_type(fb_depth, jnp.int32),
        (0, ntiles_pad * TILE - size),
        constant_values=-1,
    ).reshape(ntiles_pad * SUBS, LANES)
    kern = partial(_hqs_sum_kernel, nrows=nrows)
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))],
        out_specs=[outspec] * 4,
        out_shape=[outshape] * 4,
        scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
        interpret=interpret,
    )(cumwin, wrowtile, spid_all, sdep_all, spay_all, fbd)

    tou32 = lambda o: jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(
        ntiles_pad * TILE
    )[:size]
    return tuple(tou32(o) for o in outs)
