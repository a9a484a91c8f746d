"""Dense framebuffer construction from a SORTED point stream — no scatter.

After the frame's global 3-key sort (render/raster.py
sorted_resolve_u64_min), each pixel's u64-min winner is the FIRST entry
of its run.  XLA's TPU scatter applies updates serially (~4.8 ns/slot,
experiments/exp_oob_scatter.py), so materializing the dense planes with
`.at[tgt].set` costs ~20 ms at 4M points.  But dense construction from
a *sorted* stream is a monotone merge, not a scatter: for every pixel
`p` the winner sits at `lower_bound(spid, p)`.  This kernel runs that
merge on the VPU:

  * grid = one step per 1024-pixel framebuffer tile;
  * a host-side `searchsorted` (23 cheap gather rounds over tile
    boundaries) tells each tile which 1024-entry windows of the sorted
    stream can contain its pixels (scalar-prefetch style SMEM input);
  * the tile DMAs each window from HBM and binary-searches all 1024 of
    its pixel ids against the window in parallel (10 in-register
    gather steps), keeping the first match across windows.

Entries belonging to neighbouring tiles land in the rounded-down
window too; they simply match none of this tile's pixel ids, so no
masking is needed.  The reference's equivalent is the u64 atomicMin
in render.cu:276-303; TPU has neither atomics nor scattered stores,
and this is the scatter-free formulation.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # pixels per grid step == entries per stream window
LANES = 128
SUBS = 8  # TILE // LANES


def _rows_of(x):
    """x (8,128) -> 8 sublane rotations: rots[s][i,j] = x[(i+s)%8, j].

    Hoisted out of _flat_gather so repeated gathers on the same tile
    (the 10 binary-search probes all hit the pid plane) reuse them.
    Rotations (pltpu.roll) replace the slice+broadcast_in_dim scheme of
    round 1: the 24 per-window sublane broadcasts were ~55% of the whole
    merge kernel's time (experiments/r2_merge_tune.py); rolls are plain
    vreg shuffles.
    """
    return [
        pltpu.roll(x, shift=(SUBS - s) % SUBS, axis=0) for s in range(SUBS)
    ]


def _flat_gather(rows, pos):
    """rows = _rows_of(x); pos (8,128) flat indices in [0,1024) -> x[pos].

    Row-major flat index: entry k lives at (k // 128, k % 128).  TPU has
    no 2-D in-tile gather; compose one lane-gather per rotation and
    select the rotation that brings the target row to this sublane.
    """
    col = jnp.bitwise_and(pos, LANES - 1)
    row = jnp.right_shift(pos, 7)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
    rel = (row - srow) & (SUBS - 1)
    out = jnp.zeros((SUBS, LANES), jnp.int32)
    for s in range(SUBS):
        cand = jnp.take_along_axis(rows[s], col, axis=1)
        out = jnp.where(rel == s, cand, out)
    return out


def _bcast_row(t, s: int):
    """Plane filled with t[s, 0]'s value; t must be a lane-broadcast
    column (t[i, j] == t[i, 0]).

    Mosaic has no both-axes broadcast ("Broadcast in both sublanes and
    lanes") and re-fuses slice+broadcast chains back into one, so the
    row is extracted with a masked cross-sublane max whose (1, L)
    result broadcasts along sublanes only.
    """
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
    vals = jnp.where(srow == s, t, jnp.int32(-0x80000000))
    return jnp.broadcast_to(jnp.max(vals, axis=0, keepdims=True),
                            (SUBS, LANES))


def _search_lower_bound(lpid, pidrows, iota):
    """pos = lower_bound(lpid_window, iota) for all 1024 targets.

    The first three binary-search probes hit CONSTANT flat positions
    (511; 255/767; 127/383/639/895) — all at lane 127 of known sublanes
    — so they read from broadcasts of that column instead of paying a
    full 8-gather _flat_gather each (merge kernel 4.48 -> 3.79 ms,
    experiments/r3_merge_micro2.py).  Probes b=64..1 have 8+ candidate
    positions where broadcast trees price out; they stay gathers.
    """
    t = jnp.broadcast_to(lpid[:, LANES - 1 : LANES], (SUBS, LANES))
    m512 = _bcast_row(t, 3) < iota
    pos = m512.astype(jnp.int32) * 512
    val2 = jnp.where(m512, _bcast_row(t, 5), _bcast_row(t, 1))
    m256 = val2 < iota
    pos = pos + m256.astype(jnp.int32) * 256
    val3 = jnp.where(
        m512,
        jnp.where(m256, _bcast_row(t, 6), _bcast_row(t, 4)),
        jnp.where(m256, _bcast_row(t, 2), _bcast_row(t, 0)),
    )
    pos = pos + (val3 < iota).astype(jnp.int32) * 128
    for b in (64, 32, 16, 8, 4, 2, 1):
        probe = _flat_gather(pidrows, pos + (b - 1))
        pos = pos + (probe < iota).astype(jnp.int32) * b
    return pos


def _gather3(pidrows, deprows, payrows, posc):
    """hit/depth/payload gathers at posc, sharing the selection masks."""
    col = jnp.bitwise_and(posc, LANES - 1)
    row = jnp.right_shift(posc, 7)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
    rel = (row - srow) & (SUBS - 1)
    hitp = jnp.zeros((SUBS, LANES), jnp.int32)
    cd = jnp.zeros((SUBS, LANES), jnp.int32)
    cp = jnp.zeros((SUBS, LANES), jnp.int32)
    for s in range(SUBS):
        sel = rel == s
        hitp = jnp.where(
            sel, jnp.take_along_axis(pidrows[s], col, axis=1), hitp)
        cd = jnp.where(sel, jnp.take_along_axis(deprows[s], col, axis=1), cd)
        cp = jnp.where(sel, jnp.take_along_axis(payrows[s], col, axis=1), cp)
    return hitp, cd, cp


def _merge_kernel(firstrow_ref, nwin_ref, *rest, need_depth: bool,
                  nrows: int):
    if need_depth:
        (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
         wpid, wdep, wpay, sems) = rest
    else:
        spid_hbm, spay_hbm, outp_ref, wpid, wpay, sems = rest
        sdep_hbm = wdep = outd_ref = None
    t = pl.program_id(0)
    base = t * TILE
    empty = jnp.full((SUBS, LANES), -1, jnp.int32)
    outp_ref[...] = empty
    if need_depth:
        outd_ref[...] = empty

    tgt = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )

    fr = firstrow_ref[t]
    nw = nwin_ref[t]

    def dmas(w, slot):
        # clamp so the last window never reads past the stream end; the
        # duplicated rows it may re-read match first-match idempotently
        r0 = jnp.minimum(fr + w * SUBS, nrows - SUBS)
        cps = [
            pltpu.make_async_copy(
                spid_hbm.at[pl.ds(r0, SUBS), :], wpid.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                spay_hbm.at[pl.ds(r0, SUBS), :], wpay.at[slot], sems.at[slot, 1]
            ),
        ]
        if need_depth:
            cps.append(pltpu.make_async_copy(
                sdep_hbm.at[pl.ds(r0, SUBS), :], wdep.at[slot], sems.at[slot, 2]
            ))
        return cps

    @pl.when(nw > 0)
    def _prologue():
        for c in dmas(0, 0):
            c.start()

    def body(w, found):
        slot = jax.lax.rem(w, 2)

        @pl.when(w + 1 < nw)
        def _prefetch():
            for c in dmas(w + 1, 1 - slot):
                c.start()

        cps = dmas(w, slot)
        cps[0].wait()
        pidrows = _rows_of(wpid[slot])

        # lower_bound(pid_sorted_window, tgt) for all 1024 targets:
        # pid values are pixel ids (< 2^31 as i32) except the OOB
        # sentinel `size`, still < 2^31 for any real framebuffer.
        pos = jnp.zeros((SUBS, LANES), jnp.int32)
        for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            probe = _flat_gather(pidrows, pos + (b - 1))
            pos = pos + (probe < tgt).astype(jnp.int32) * b
        posc = jnp.minimum(pos, TILE - 1)
        hitpid = _flat_gather(pidrows, posc)
        take = ((hitpid == tgt) & (found == 0)).astype(jnp.int32)
        keep = 1 - take

        for c in cps[1:]:
            c.wait()
        pay = _flat_gather(_rows_of(wpay[slot]), posc)
        outp_ref[...] = (take * pay) | (keep * outp_ref[...])
        if need_depth:
            dep = _flat_gather(_rows_of(wdep[slot]), posc)
            outd_ref[...] = (take * dep) | (keep * outd_ref[...])
        return found | take

    jax.lax.fori_loop(0, nw, body, jnp.zeros((SUBS, LANES), jnp.int32))


# ---------------------------------------------------------------------------
# v2: dense framebuffer from a pid-ONLY sorted stream (nk1 sort)
# ---------------------------------------------------------------------------
#
# The 3-key sort that v1 requires costs 8.4 ms at 4.2M points on v5e; a
# single-key (pid) unstable sort carrying depth+payload costs 2.4 ms
# (experiments/r2_sort_menu.py).  v2 accepts the nk1 stream — entries of
# one pixel are contiguous but in ARBITRARY (depth, payload) order — and
# restores exact u64-min semantics inside the kernel: each window gets a
# segmented suffix-min (segments = pid runs) via log2(TILE) flat-order
# roll steps, after which the entry at lower_bound(pid) carries the min
# over its entire run-within-window; runs spanning window borders are
# handled by u64-min-combining across windows (no carry needed).

TPS = 4  # framebuffer tiles resolved per grid step (amortizes grid cost)
TPS_BITS = (TPS - 1).bit_length()  # packed-window local-tile field width


def _flat_shift(x, s: int):
    """out[k] = x[(k + s) % TILE] over the (8,128) row-major flat order.

    pltpu.roll only takes non-negative (downward) shifts; an upward
    shift by s is a circular roll by n - s.
    """
    if s % LANES == 0:
        return pltpu.roll(x, shift=SUBS - (s // LANES) % SUBS, axis=0)
    a = pltpu.roll(x, shift=LANES - s, axis=1)
    b = pltpu.roll(a, shift=SUBS - 1, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    return jnp.where(col < LANES - s, a, b)


def _suffix_min_u64(lpid, d, p, steps: int = 10):
    """Segmented suffix-min of (d,p) u64 keys; segments = runs of lpid.

    lpid ascending (8,128) row-major flat; i32 compares are safe: depth
    bits of w>0 points have sign bit 0, payloads are RGB<<0|..<= 2^24,
    and the EMPTY sentinel never appears inside a window.

    `steps` doubling steps complete the suffix-min for runs up to
    2**steps long; callers with a verified run bound pass fewer than the
    full 10 (the bound is checked on device and falls back via lax.cond
    — see dense_from_sorted_rows).
    """
    s = 1
    while s < (1 << steps):
        rl = _flat_shift(lpid, s)
        rd = _flat_shift(d, s)
        rp = _flat_shift(p, s)
        valid = rl == lpid
        less = (rd < d) | ((rd == d) & (rp < p))
        take = valid & less
        d = jnp.where(take, rd, d)
        p = jnp.where(take, rp, p)
        s *= 2
    return d, p


def _merge_nk1_kernel(cumwin_ref, wrowtile_ref, *rest, nrows: int,
                      suffix_steps: int = 10):
    (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
     wpid, wdep, wpay, sems) = rest
    prog = pl.program_id(0)
    # depth/payload compares must be UNSIGNED: bias by XOR 0x80000000 so
    # signed i32 compares order like u32.  The best-so-far identity is
    # then 0x7FFFFFFF == biased u32-max == biased EMPTY: untouched
    # pixels unbias to the EMPTY sentinel with no extra select.
    bias = jnp.int32(-0x80000000)
    maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )
    t0 = prog * TPS
    lo = cumwin_ref[t0]
    hi = cumwin_ref[t0 + TPS]

    def dma(g, slot):
        # window start rows are pre-clamped per stream at table build
        r0 = jnp.minimum(wrowtile_ref[g] >> TPS_BITS, nrows - SUBS)
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

    # prologue: fill the DMA ring across tile boundaries — the deep
    # pipeline is the point: post-collapse frames average ~1 window per
    # tile, so a per-tile double buffer would expose every DMA's latency
    for r in range(RING):
        @pl.when(lo + r < hi)
        def _fill(r=r):
            for c in dma(lo + r, r):
                c.start()

    # loop: wait, process, then prefetch g+RING into the freed slot
    def body2(g, best):
        bd0, bp0, bd1, bp1, bd2, bp2, bd3, bp3 = best
        slot = jax.lax.rem(g - lo, RING)  # prologue filled slots 0..R-1
        for c in dma(g, slot):
            c.wait()
        lt = wrowtile_ref[g] & (TPS - 1)  # 0..TPS-1 local tile
        lpid = wpid[slot] - (t0 + lt) * TILE
        dep, pay = _suffix_min_u64(lpid, wdep[slot] ^ bias, wpay[slot] ^ bias,
                                   suffix_steps)

        pidrows = _rows_of(lpid)
        pos = _search_lower_bound(lpid, pidrows, iota)
        posc = jnp.minimum(pos, TILE - 1)
        hitp, cd, cp = _gather3(pidrows, _rows_of(dep), _rows_of(pay), posc)
        hit = hitp == iota

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

    init = (maxi, maxi, maxi, maxi, maxi, maxi, maxi, maxi)
    out = jax.lax.fori_loop(lo, hi, body2, init)
    for k in range(TPS):
        outp_ref[k * SUBS : (k + 1) * SUBS, :] = out[2 * k + 1] ^ bias
        outd_ref[k * SUBS : (k + 1) * SUBS, :] = out[2 * k] ^ bias


def _merge_nk1_kernel_ilp(cumwin_ref, wrowtile_ref, *rest, nrows: int,
                          wide: int = 2, suffix_steps: int = 10):
    """`wide`-windows-per-iteration variant of _merge_nk1_kernel.

    The v2 kernel's inner loop is latency-bound: the 10-probe binary
    search and the suffix-min are serial dependency chains on single
    (8,128) vregs, so the VPU idles between steps.  Processing `wide`
    windows per fori_loop body gives the scheduler independent chains
    to interleave.  The table builder pads every program's window count
    to a multiple of `wide` with dummy windows aimed at the stream tail
    (sentinel entries -> no hits; re-reading real entries is idempotent
    under the min accumulator), so no in-kernel clamping is needed.
    """
    (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
     wpid, wdep, wpay, sems) = rest
    prog = pl.program_id(0)
    bias = jnp.int32(-0x80000000)
    maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )
    t0 = prog * TPS
    lo = cumwin_ref[t0]
    hi = cumwin_ref[t0 + TPS]

    def dma(g, slot):
        r0 = jnp.minimum(wrowtile_ref[g] >> TPS_BITS, nrows - SUBS)
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

    def one_window(g, slot):
        """Load + suffix-min + probe one window; returns (lt, hit, cd, cp)."""
        for c in dma(g, slot):
            c.wait()
        lt = wrowtile_ref[g] & (TPS - 1)
        lpid = wpid[slot] - (t0 + lt) * TILE
        dep, pay = _suffix_min_u64(lpid, wdep[slot] ^ bias, wpay[slot] ^ bias,
                                   suffix_steps)
        pidrows = _rows_of(lpid)
        pos = _search_lower_bound(lpid, pidrows, iota)
        posc = jnp.minimum(pos, TILE - 1)
        hitp, cd, cp = _gather3(pidrows, _rows_of(dep), _rows_of(pay), posc)
        return lt, hitp == iota, cd, cp

    def upd(best, res):
        lt, hit, cd, cp = res
        out = []
        for kk in range(TPS):
            bd, bp = best[2 * kk], best[2 * kk + 1]
            mine = lt == kk
            less = (cd < bd) | ((cd == bd) & (cp < bp))
            take = mine & hit & less
            out.append(jnp.where(take, cd, bd))
            out.append(jnp.where(take, cp, bp))
        return tuple(out)

    def body2(k, best):
        g0 = lo + wide * k
        ress = []
        for j in range(wide):
            g = g0 + j
            s = jax.lax.rem(g - lo, RING)
            ress.append(one_window(g, s))

            @pl.when(g + RING < hi)
            def _pf(g=g, s=s):
                for c in dma(g + RING, s):
                    c.start()

        for res in ress:
            best = upd(best, res)
        return best

    init = (maxi,) * (2 * TPS)
    out = jax.lax.fori_loop(0, jax.lax.div(hi - lo, wide), body2, init)
    for k in range(TPS):
        outp_ref[k * SUBS : (k + 1) * SUBS, :] = out[2 * k + 1] ^ bias
        outd_ref[k * SUBS : (k + 1) * SUBS, :] = out[2 * k] ^ bias


def _shift_down1(x):
    """prev[k] = x[k-1] over the (8,128) row-major flat order (circular
    at k=0, which callers head-force anyway)."""
    a = pltpu.roll(x, shift=1, axis=1)
    b = pltpu.roll(a, shift=1, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    return jnp.where(col == 0, b, a)


def _merge_matscatter_kernel(cumwin_ref, wrowtile_ref, *rest, nrows: int,
                             wide: int = 1, suffix_steps: int = 0,
                             pay_planes: int = 4):
    """MXU scatter-matmul merge kernel — no binary search, no serial
    dependency chains (experiments/r3_matscatter.py: 2.84 vs 3.76 ms on
    the 4.2M orbit window set, and throughput- rather than latency-bound).

    Each window's per-pixel winners are scattered to their tile pixels
    by a head-masked factorized one-hot matmul:

        OUT[pr, pc] = sum_k head[k] * (hi[k]==pr) * (lo[k]==pc) * V[k]

    with hi = lpid>>7 one-hot on sublanes (LHS), lo = lpid&127 one-hot
    as C[l, j] = (lo7[j] == l) — built by a cheap SUBLANE broadcast
    against a constant sublane-iota and contracted on the rhs SECOND
    dim, so the MXU absorbs the orientation and no VPU transpose or
    lane broadcast is ever issued (experiments/r3_corient.py: the
    transpose-based build cost 1.56 ms/frame, 55% of the kernel; this
    form runs 2.84 -> 1.35 ms on the same orbit window set).  V = the
    biased depth/payload split into 4 bytes each so bf16 products are
    exact (head-masking keeps one contributor per pixel per window; the
    single nonzero accumulates exactly in f32).

    `suffix_steps=0` requires FULLY sorted rows (num_keys=3: the head
    entry of every pid run is the exact u64 min).  `suffix_steps>0`
    accepts nk1 rows and restores run minima with the segmented
    suffix-min first — the ops are throughput-additive here, unlike in
    the latency-bound probe kernel.

    `pay_planes` (static, 0..4) is the number of payload BYTE planes
    scattered.  The per-er A-build (8 broadcast+mul vreg ops per plane)
    is the kernel's VPU floor, so callers whose payloads are narrower
    than 32 bits drop the dead planes: the flagship BC1 payload is
    R|G<<8|B<<16 (24-bit, pallas_project._bc1_payload) -> 3 planes;
    the HQS prepass discards the payload plane entirely -> 0 planes
    (the depth plane is the exact min depth regardless of payload
    tie-breaks).  Missing planes read back as payload bits 0.
    """
    (spid_hbm, sdep_hbm, spay_hbm, outd_ref, outp_ref,
     wpid, wdep, wpay, sems) = rest
    prog = pl.program_id(0)
    bias = jnp.int32(-0x80000000)
    maxi = jnp.full((SUBS, LANES), 0x7FFFFFFF, jnp.int32)
    sr8 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
    flat = sr8 * LANES + jax.lax.broadcasted_iota(
        jnp.int32, (SUBS, LANES), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    t0 = prog * TPS
    lo_w = cumwin_ref[t0]
    hi_w = cumwin_ref[t0 + TPS]

    def dma(g, slot):
        r0 = jnp.minimum(wrowtile_ref[g] >> TPS_BITS, nrows - SUBS)
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
        lpid = wpid[slot] - (t0 + lt) * TILE
        depv = wdep[slot] ^ bias
        payv = wpay[slot] ^ bias
        if suffix_steps:
            depv, payv = _suffix_min_u64(lpid, depv, payv, suffix_steps)
        prev = _shift_down1(lpid)
        head = ((lpid != prev) | (flat == 0)) & (lpid >= 0) & (lpid < TILE)
        # fold the head mask into the sublane index (-1 never matches
        # sr8): saves the per-er & in the m8 build, 1.35 -> 1.27 ms on
        # the orbit window set (experiments/r3_flushacc.py)
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
            for q in range(pay_planes)
        ]
        nplanes = 4 + pay_planes
        # scatter byte3+1 (1..256, still bf16-exact) so ANY hit leaves a
        # nonzero plane-3 residue — a raw top depth byte can be 0
        cvs[3] = cvs[3] + 1
        bc = lambda x, er: jax.lax.broadcast_in_dim(
            x[er:er + 1, :], (SUBS, LANES), (0, 1))
        bcl = lambda x, er: jax.lax.broadcast_in_dim(
            x[er:er + 1, :], (LANES, LANES), (0, 1))
        OUT = None
        for er in range(SUBS):
            C = (bcl(lo7, er) == sub_iota).astype(jnp.bfloat16)
            m8 = (bc(hi3, er) == sr8).astype(jnp.bfloat16)
            rows = [m8 * bc(cvs[q], er).astype(jnp.bfloat16)
                    for q in range(nplanes)]
            A = jnp.concatenate(rows, axis=0)  # (8*nplanes, 128)
            d = jax.lax.dot_general(
                A, C, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            OUT = d if OUT is None else OUT + d
        conv = OUT.astype(jnp.int32)
        pls = [conv[q * SUBS:(q + 1) * SUBS, :] for q in range(nplanes)]
        hit = pls[3] != 0
        b3 = pls[3] - hit.astype(jnp.int32)  # undo the +1 hit marker
        cd = pls[0] | (pls[1] << 8) | (pls[2] << 16) | (b3 << 24)
        if pay_planes == 4:
            cp = pls[4] | (pls[5] << 8) | (pls[6] << 16) | (pls[7] << 24)
        else:
            # dropped planes reconstruct as payload-bits 0; every value
            # here is still ^bias, so the missing TOP byte is the
            # constant bias byte 0x80 (payload byte3 == 0 for every
            # pay_planes<4 caller) — comparisons and the final ^bias
            # then match the full-plane kernel bit-for-bit
            zero = jnp.zeros((SUBS, LANES), jnp.int32)
            pp = pls[4:] + [zero] * (3 - pay_planes)
            cp = (pp[0] | (pp[1] << 8) | (pp[2] << 16)
                  | jnp.int32(-0x80000000))
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


RING = 6  # in-flight window DMAs; covers HBM latency across tiny tiles
ILP_WIDE = 2  # windows per loop iteration in the ILP kernel
# merge kernel for the rows path: "matscatter" replaces the per-pixel
# probe binary search with head-masked one-hot MXU matmuls — the kernel
# becomes throughput-bound instead of latency-bound (2.84 vs 3.76 ms on
# the 4.2M orbit window set, experiments/r3_matscatter.py).  wide=1: the
# ILP interleave only ever hid the probe chain's serial latency.
MERGE_KERNEL = os.environ.get("PM_MERGE_KERNEL", "matscatter")
# sort keys the rows-path callers use (huffman_tpu reads this): 3 makes
# every pid run's head entry its exact u64 min, so the throughput-bound
# matscatter kernel can skip the per-window suffix-min entirely
# (suffix_steps=0); the nk3 sort costs ~+0.56 ms at 128x32K
# (experiments/r3_fullsort.py) but the suffix ops cost more on
# window-heavy views.
SORT_KEYS = int(os.environ.get("PM_SORT_KEYS", "3"))
# window-table size for the fast table build (device-checked: a group
# whose total window count reaches WCAP falls back to the worst-case-
# sized table).  Observed per-group maxima are ~6K across bench views
# and scale groups.
WCAP = 16384
# fast-path suffix-scan depth: 5 doubling steps complete runs <= 32.
# Measured max runs are 16/23/29 across the three bench views
# (experiments/r3_xla_menu.py views stage); a one-compare device check
# picks the full 10-step kernel via lax.cond whenever the bound is
# exceeded, so shorter fast scans stay exact.
FAST_SUFFIX_STEPS = 5


def _runs_bounded(sp2d, size: int):
    """True iff no live pid repeats at distance 2**FAST_SUFFIX_STEPS
    within any row — i.e. every same-pid run is short enough for the
    fast suffix-scan kernels."""
    K = 1 << FAST_SUFFIX_STEPS
    if sp2d.shape[-1] <= K:
        return jnp.bool_(True)
    a, b = sp2d[..., K:], sp2d[..., :-K]
    return ~jnp.any((a == b) & (a < jnp.uint32(size)))


@partial(jax.jit, static_argnames=("size", "need_depth", "interpret"))
def dense_from_sorted_nk1(spid, sdep, spay, size: int,
                          need_depth: bool = True, interpret: bool = False):
    """(pid-sorted pid, depth, payload) -> dense (fb_d, fb_p), EMPTY-filled.

    spid must be ascending with OOB entries (pid >= size) at the end;
    (depth, payload) may be in ANY order within a pixel run — the kernel
    computes the exact u64 (depth<<32|payload) min per pixel.  Unlike v1
    this only needs a num_keys=1 sort (3.5-6.7x cheaper on TPU).
    """
    return dense_from_sorted_nk1_multi(
        [(spid, sdep, spay)], size, need_depth, interpret
    )


# the packed window-word table lives in SMEM (1 MB); cap one kernel
# call's table at ~720 KB and resolve bigger frames in stream groups
# whose dense planes combine exactly (elementwise u64-min / sums)
_SMEM_WORD_BUDGET = 180_000


def group_streams(parts, ntiles_pad: int, budget: int | None = None):
    """Split parts into groups whose window tables each fit in SMEM.

    Grouping is shape-only (trace-time static).  One render chunk is
    always far below the budget, so every group is non-empty.  The
    budget reads the module global at call time so tests can shrink it.
    """
    budget = _SMEM_WORD_BUDGET if budget is None else budget
    groups, cur, words = [], [], 0
    for part in parts:
        w = ntiles_pad + part[0].shape[0] // TILE
        if cur and words + w > budget:
            groups.append(cur)
            cur, words = [], 0
        cur.append(part)
        words += w
    groups.append(cur)
    return groups


@partial(jax.jit,
         static_argnames=("size", "need_depth", "interpret", "ilp"))
def dense_from_sorted_nk1_multi(parts, size: int, need_depth: bool = True,
                                interpret: bool = False, ilp: bool = True):
    """Multi-stream variant: `parts` is a list of independently
    pid-sorted (spid, sdep, spay) triples (one per render chunk).

    Sorting each ~4M chunk separately is much cheaper than one global
    sort (XLA sort cost grows superlinearly: 1.3 ms at 4.2M vs 18.7 ms
    at 16.7M on Morton-coherent frames, experiments/r2_merge_real.py),
    and each Morton chunk is spatially compact so it only adds windows
    to the tiles it covers.  The kernel min-combines windows from all
    streams per tile — exactness needs no cross-stream order.

    Beyond ~200M points one call's SMEM window table would overflow, so
    streams resolve in groups and the group planes combine with an
    exact elementwise u64 (depth<<32|payload) min — identical winners,
    since min is associative over any partition of the entries.
    """
    ntiles = -(-size // TILE)
    nprog0 = -(-ntiles // TPS)
    groups = group_streams(parts, nprog0 * TPS)
    fbd = fbp = None
    for g in groups:
        d, p = _dense_nk1_group(g, size, interpret, ilp)
        if fbd is None:
            fbd, fbp = d, p
        else:
            less = (d < fbd) | ((d == fbd) & (p < fbp))
            fbd = jnp.where(less, d, fbd)
            fbp = jnp.where(less, p, fbp)
    return (fbd if need_depth else None), fbp


def _dense_nk1_group(parts, size: int, interpret: bool, ilp: bool = True):
    """One merge-kernel invocation over a stream group (see caller).

    The window list is flattened across tiles and streams (SMEM tables
    wrow/wtile with per-program cumwin bounds) so the DMA ring stays
    RING-deep even when most tiles have a single window.  Window start
    rows are pre-clamped per stream so a window never reads across a
    stream boundary (entries there wouldn't be sorted relative to it).
    Both fb planes always materialize (the u64 min needs depth
    regardless).
    """
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

    # interleave the streams' windows per tile: for tile t the flat list
    # holds stream 0's windows, then stream 1's, ...  (tile, start row)
    # pack into ONE i32 per window: SMEM is 1 MB, and two i32 tables
    # overflow it at ~100M points.  The kernel only ever needs the tile
    # index RELATIVE to its program's base (lt = tile mod TPS — cumwin
    # bounds imply the rest), so the low field is TPS_BITS wide, leaving
    # 29 row bits (~68G points) instead of an absolute-tile field that
    # capped scenes at ~134M points per 1080p framebuffer.
    assert rowoff < (1 << (31 - TPS_BITS)), (
        "scene too large for packed window tables "
        f"({rowoff} rows, {ntiles_pad} tiles)"
    )
    nwin_tot = sum(nw for _fr, nw, _e in per_stream)
    if ilp:
        # pad every program's window count to a multiple of ILP_WIDE for
        # the wide kernel: the extra slots land on the program's last
        # tile, stay unclaimed by any stream, and so read the stream
        # tail (the wrow default below) — sentinel entries, no hits,
        # exact.
        psum = nwin_tot.reshape(nprog, TPS).sum(axis=1)
        pad = (-psum) % ILP_WIDE
        pad_vec = jnp.zeros((nprog, TPS), jnp.int32).at[:, TPS - 1].set(
            pad
        ).reshape(ntiles_pad)
        nwin_tot = nwin_tot + pad_vec
        wmax += nprog * (ILP_WIDE - 1)
    cumwin = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nwin_tot, dtype=jnp.int32)]
    )
    gidx = jnp.arange(wmax, dtype=jnp.int32)
    wtile = jnp.clip(
        jnp.searchsorted(cumwin, gidx, side="right").astype(jnp.int32) - 1,
        0, ntiles_pad - 1,
    )
    wloc = gidx - jnp.take(cumwin, wtile)  # window index within the tile
    wrow = jnp.full((wmax,), nrows - SUBS, jnp.int32)
    base = jnp.zeros(ntiles_pad, jnp.int32)
    for fr, nw, stream_end in per_stream:
        mine = (wloc >= jnp.take(base, wtile)) & (
            wloc < jnp.take(base + nw, wtile)
        )
        local = wloc - jnp.take(base, wtile)
        row = jnp.take(fr, wtile) + local * SUBS
        # pre-clamp: never read past this stream's end
        row = jnp.minimum(row, stream_end - SUBS)
        wrow = jnp.where(mine, row, wrow)
        base = base + nw
    wrowtile = (wrow << TPS_BITS) | (wtile & (TPS - 1))

    cat = lambda arrs: (
        jnp.concatenate(arrs) if len(arrs) > 1 else arrs[0]
    )
    as_i32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    ).reshape(-1, LANES)
    spid_all = as_i32(cat([p for p, _d, _y in parts]))
    sdep_all = as_i32(cat([d for _p, d, _y in parts]))
    spay_all = as_i32(cat([y for _p, _d, y in parts]))

    kern = partial(
        _merge_nk1_kernel_ilp, nrows=nrows, wide=ILP_WIDE
    ) if ilp else partial(_merge_nk1_kernel, nrows=nrows)
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[outspec] * 2,
        out_shape=[outshape] * 2,
        scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
        interpret=interpret,
    )(cumwin, wrowtile, spid_all, sdep_all, spay_all)
    outd, outp = outs

    tou32 = lambda o: jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(
        ntiles_pad * TILE
    )[:size]
    return tou32(outd), tou32(outp)


# ---------------------------------------------------------------------------
# v3: dense framebuffer from MANY equal-width pid-sorted streams (rows)
# ---------------------------------------------------------------------------
#
# The frame's global nk1 sort costs 6.4 ms at 4.2M entries on v5e, but
# XLA's batched sort over (rows, n) rows is dramatically cheaper at
# small n (0.87 ms at 256x16384, experiments/r3_sort_menu.py).  With the
# swizzled (32x32-px tile) pid space each Morton row-segment stays
# screen-compact, so per-stream windows grow only mildly
# (experiments/r3_windows.py).  This path accepts the (S, n) sorted
# rows directly and builds the flat window table fully vectorized over
# streams (the v2 builder loops per stream in Python — fine for ~4
# chunks, fatal for hundreds of rows).


@partial(jax.jit,
         static_argnames=("size", "need_depth", "interpret", "ilp",
                          "tile_cols", "fully_sorted", "pay_bits"))
def dense_from_sorted_rows(sp2d, sd2d, sy2d, size: int,
                           need_depth: bool = True,
                           interpret: bool = False, ilp: bool = True,
                           tile_cols: int | None = None,
                           fully_sorted: bool = False,
                           pay_bits: int = 32):
    """(S, n) pid-sorted rows -> dense (fb_d, fb_p), EMPTY-filled.

    Each row is an independently pid-ascending stream (OOB sentinels at
    its tail); the kernel min-combines windows from all rows per tile —
    exact u64 (depth<<32|payload) winners.  Rows are processed in groups
    whose window tables fit the SMEM budget; group planes combine with
    an exact elementwise u64-min.  `tile_cols` (the swizzled grid's
    tile-row width) enables the clipped 2D-box table build.
    `fully_sorted` promises rows sorted by the FULL (pid, dep, pay) key
    (num_keys=3): every run's head entry is its exact u64 min, so the
    kernels skip the segmented suffix-min (suffix_steps=0).
    `pay_bits` (static) promises every live payload < 2**pay_bits; the
    matscatter kernel then scatters only ceil(pay_bits/8) payload byte
    planes (the per-plane A-build is its VPU floor).  pay_bits=0 means
    the caller discards the payload plane entirely (HQS prepass) — the
    returned fb_p is NOT meaningful then, but fb_d is still the exact
    min depth.
    """
    S, n = sp2d.shape
    assert n % TILE == 0, n
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    fast_ok = True if fully_sorted else _runs_bounded(sp2d, size)
    pay_planes = -(-pay_bits // 8)

    def render(clip):
        words_per_stream = (ntiles_pad if clip is None else clip) + n // TILE
        smax = max(1, (_SMEM_WORD_BUDGET - nprog) // words_per_stream)
        fbd = fbp = None
        for g0 in range(0, S, smax):
            d, p = _dense_rows_group(
                sp2d[g0:g0 + smax], sd2d[g0:g0 + smax], sy2d[g0:g0 + smax],
                size, interpret, ilp, fast_ok, clip, tile_cols,
                fully_sorted, pay_planes,
            )
            if fbd is None:
                fbd, fbp = d, p
            else:
                less = (d < fbd) | ((d == fbd) & (p < fbp))
                fbd = jnp.where(less, d, fbd)
                fbp = jnp.where(less, p, fbp)
        return fbd, fbp

    if CLIP_TILES < ntiles_pad:
        fbd, fbp = jax.lax.cond(
            _clip_fits(sp2d, size, CLIP_TILES, tile_cols),
            lambda: render(CLIP_TILES),
            lambda: render(None),
        )
    else:
        fbd, fbp = render(None)
    return (fbd if need_depth else None), fbp


# per-stream pair-grid clip (tiles).  Each sorted row is Morton-compact
# on screen (2D tile-box areas p50=31, p100=775 across the bench views,
# experiments/r3_build_v2.py) so its (stream, tile) pair grid clips to
# a per-stream 2D box of <= CLIP tiles — shrinking every table-build
# domain ~2-4x at 1080p (0.57 ms vs 7.7 full / 4.33 old sort-merge).
# A one-reduce device check picks the full-grid build via lax.cond
# when any stream's box is bigger.
CLIP_TILES = 1024


def _tile_boxes(sp2d, size: int, tile_cols: int):
    """Per-row live-tile bounding boxes in the 2D tile grid.

    Tile ids are row-major over `tile_cols` columns (the swizzled pid
    space, raster.swizzle_pid), so a screen-compact stream footprint is
    compact as a 2D BOX, not as a 1D id range (a 10x10-tile square
    spans ~9*wt+10 linear ids).  Returns (bx, by, cw, ch) i32 (S,)."""
    ntiles = -(-size // TILE)
    tile = jnp.minimum(sp2d >> 10, jnp.uint32(ntiles)).astype(jnp.int32)
    live = tile < ntiles
    tx = tile % tile_cols
    ty = tile // tile_cols
    big = jnp.int32(1 << 29)
    bx = jnp.min(jnp.where(live, tx, big), axis=1)
    by = jnp.min(jnp.where(live, ty, big), axis=1)
    ex = jnp.max(jnp.where(live, tx, -1), axis=1)
    ey = jnp.max(jnp.where(live, ty, -1), axis=1)
    any_live = jnp.any(live, axis=1)
    bx = jnp.where(any_live, bx, 0)
    by = jnp.where(any_live, by, 0)
    cw = jnp.where(any_live, ex - bx + 1, 1)
    ch = jnp.where(any_live, ey - by + 1, 1)
    return bx, by, cw, ch


def _clip_fits(sp2d, size: int, clip: int, tile_cols: int | None = None):
    """True iff every row's live-tile 2D box fits `clip` pairs."""
    _bx, _by, cw, ch = _tile_boxes(sp2d, size, tile_cols or (-(-size // TILE)))
    return jnp.max(cw * ch) <= clip


def build_rows_window_table(sp2d, size: int, wide: int,
                            reread_bits: int = 0, clip: int | None = None,
                            tile_cols: int | None = None,
                            wcap: int | None = None,
                            rowstride: int | None = None,
                            win_rows: int = SUBS):
    """Sort-free flat window table over S equal-width sorted rows.

    Per-(stream, tile) pair counts come from an MXU one-hot histogram
    (a searchsorted here costs 19-40 ms at S=128; the matmul is
    bandwidth-bound on the one-hot operands only).  The flat expansion
    pair->windows is SORT-FREE and SCATTER-FREE: window g's owning
    pair is the last pair m with ex[m] <= g (ex = exclusive cumsum of
    per-pair window counts) = (#pairs with ex <= g) - 1, i.e. the
    inclusive cumsum of an ex-histogram — one more MXU one-hot product
    (the previous scatter-max + cummax + full-domain gather cost 1.8 of
    the 2.4 ms build, experiments/r3_build_v3.py; XLA TPU scatters
    apply updates serially).

    `wcap` bounds the window table size (default: the worst-case wmax).
    Callers must guarantee total windows < wcap (device-check
    cumwin[-1] and lax.cond to a full-size build otherwise); the
    expansion/gather domain then shrinks ~8x.

    `rowstride` is the HBM row stride in 128-lane units when sp2d is a
    caller-sliced LIVE PREFIX of wider rows (live entries sort before
    the OOB sentinels, so prefix positions equal full-row positions and
    only the histogram input shrinks).

    `clip` (CLIP_TILES) shrinks the pair grid to a per-stream window of
    `clip` tiles anchored at the stream's first live tile — callers
    verify every stream fits (_clip_fits) and lax.cond to the full grid
    otherwise.  Clipped pairs carry their global tile and sort by it
    (one small sort of S*clip records) so the flat window order stays
    program-major.

    `win_rows` (static, <= SUBS) is the window size in 128-entry rows:
    each window holds win_rows*128 consecutive stream entries.  Smaller
    windows make sparse (row, tile) pairs proportionally cheaper in the
    matscatter kernel (fewer er iterations) while dense pairs just get
    more windows at the same total entry count — the kernel must be
    built with the same win_rows.

    Returns (cumwin, wrowtile, nrows, nprog) where wrowtile packs, per
    window, `row << (TPS_BITS + reread_bits) | reread << TPS_BITS |
    local_tile`.  reread_bits=0 (the min-merge kernels: clamp re-reads
    are idempotent) omits the field; reread_bits=3 (the HQS sum kernel)
    records how many leading rows of a clamped window were already
    covered by the previous window, so sums can drop them.
    """
    S, n = sp2d.shape
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    rowstride = n // LANES if rowstride is None else rowstride
    nrows = S * rowstride
    assert nrows < (1 << (29 - TPS_BITS - reread_bits)), "group too large"

    wents = win_rows * LANES  # entries per window
    grid = ntiles_pad if clip is None else clip
    F = int(np.ceil(np.sqrt(grid + 1)))
    tile = jnp.minimum(sp2d >> 10, jnp.uint32(ntiles)).astype(jnp.int32)
    if clip is None:
        loc = tile  # sentinel/OOB entries land in bucket `ntiles`
    else:
        # per-stream 2D tile-box window: lt = (ty-by)*cw + (tx-bx).
        # live tiles fall in [0, cw*ch) <= clip when the caller-verified
        # fit holds; bucket `clip` collects sentinels (and any overflow
        # if the caller skipped the check — wrong image, never unsafe)
        wt_cols = tile_cols or ntiles
        bx, by, cw, _ch = _tile_boxes(sp2d, size, wt_cols)
        tx = tile % wt_cols
        ty = tile // wt_cols
        loc = (ty - by[:, None]) * cw[:, None] + (tx - bx[:, None])
        loc = jnp.where(tile < ntiles, jnp.clip(loc, 0, clip), clip)
    hi = loc // F
    lo = loc - hi * F
    # int8 one-hots: the (S, n, F) operand materialization dominates the
    # whole build (bf16 read ~1.4 ms of the 2.2 ms build at 128x32K);
    # int8 halves it and the MXU s8xs8->s32 product is exact (0/1 inputs)
    A = (hi[:, :, None] == jnp.arange(F, dtype=jnp.int32)).astype(jnp.int8)
    Bm = (lo[:, :, None] == jnp.arange(F, dtype=jnp.int32)).astype(jnp.int8)
    counts = jax.lax.dot_general(
        A, Bm, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).reshape(S, F * F)[:, :grid]
    if clip is None:
        # padding/sentinel tiles hold no pixels: no windows for them
        counts = jnp.where(jnp.arange(grid)[None, :] < ntiles, counts, 0)
    s1 = jnp.cumsum(counts, axis=1, dtype=jnp.int32)
    s0 = s1 - counts
    first_row_local = s0 // LANES
    span = s1 - first_row_local * LANES
    nwin = jnp.where(s1 > s0, (span + wents - 1) // wents, 0)  # (S, grid)
    first_row = first_row_local + (
        jnp.arange(S, dtype=jnp.int32) * rowstride
    )[:, None]

    wmax = S * grid + S * (-(-n // wents)) + nprog * (wide - 1)
    wtot = wmax if wcap is None else wcap
    gidx = jnp.arange(wtot, dtype=jnp.int32)

    if clip is None:
        # full grid is naturally tile-major: m = t*S + s
        M = grid * S
        m_iota = jnp.arange(M, dtype=jnp.int32)
        cnt = jnp.transpose(nwin).reshape(M)
        fval = (jnp.transpose(first_row).reshape(M) << 2) | (
            m_iota // S & (TPS - 1)
        )
        send = (jax.lax.rem(m_iota, S) + 1) * rowstride
        if wide > 1:
            # pad each program's window count to a multiple of `wide`;
            # the extra windows attach to the program's LAST pair
            # (idempotent re-reads — exact either way)
            psum = cnt.reshape(nprog, TPS * S).sum(axis=1)
            pad = (-psum) % wide
            cnt = cnt.reshape(nprog, TPS * S).at[:, -1].add(pad).reshape(M)
        cumwin = jnp.concatenate([
            jnp.zeros(1, jnp.int32),
            jnp.cumsum(cnt.reshape(grid, S).sum(axis=1), dtype=jnp.int32),
        ])
    else:
        # clipped pairs carry global tiles; order them tile-major with
        # one small sort.  nprog extra records implement the per-program
        # ILP padding (they sort after every real pair of their tile).
        lt_iota = jnp.arange(clip, dtype=jnp.int32)[None, :]
        gtile = ((by[:, None] + lt_iota // cw[:, None]) * wt_cols
                 + bx[:, None] + lt_iota % cw[:, None])
        gtile = jnp.where(nwin > 0, gtile, ntiles_pad - 1)
        # windows per global tile (weighted one-hot matmul; per-pair
        # window counts stay < 128 so int8 weights are exact)
        assert n // wents + 1 < 128, "row width too large for int8 weights"
        F2 = int(np.ceil(np.sqrt(ntiles_pad)))
        g2 = gtile.reshape(-1)
        hi2 = (g2 // F2)[:, None] == jnp.arange(F2, dtype=jnp.int32)
        lo2 = (g2 - (g2 // F2) * F2)[:, None] == jnp.arange(
            F2, dtype=jnp.int32)
        wt = jax.lax.dot_general(
            hi2.astype(jnp.int8) *
            nwin.reshape(-1)[:, None].astype(jnp.int8),
            lo2.astype(jnp.int8),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(F2 * F2)[:ntiles_pad]
        pad = jnp.zeros(nprog, jnp.int32)
        if wide > 1:
            psum = wt.reshape(nprog, TPS).sum(axis=1)
            pad = (-psum) % wide
            wt = wt.reshape(nprog, TPS).at[:, TPS - 1].add(pad).reshape(
                ntiles_pad)
        cumwin = jnp.concatenate([
            jnp.zeros(1, jnp.int32), jnp.cumsum(wt, dtype=jnp.int32)
        ])
        sidx = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[:, None], (S, clip)
        ).reshape(-1)
        key = jnp.concatenate([
            gtile.reshape(-1) * (S + 1) + sidx,
            (jnp.arange(nprog, dtype=jnp.int32) * TPS + TPS - 1) * (S + 1)
            + S,  # pad records: after every real pair of their tile
        ])
        cnt = jnp.concatenate([nwin.reshape(-1), pad])
        fval = jnp.concatenate([
            (first_row.reshape(-1) << 2) | (gtile.reshape(-1) & (TPS - 1)),
            jnp.full(nprog, ((nrows - SUBS) << 2) | (TPS - 1), jnp.int32),
        ])
        send = jnp.concatenate([
            (sidx + 1) * rowstride,
            jnp.full(nprog, nrows, jnp.int32),
        ])
        _k, cnt, fval, send = jax.lax.sort(
            [key, cnt, fval, send], num_keys=1, is_stable=False
        )
        M = cnt.shape[0]
        m_iota = jnp.arange(M, dtype=jnp.int32)

    cumc = jnp.cumsum(cnt, dtype=jnp.int32)
    ex = cumc - cnt  # pair m owns windows [ex, ex+cnt)
    # owner of window g = last pair with ex <= g = (#pairs ex <= g) - 1
    # (m is ordered by ex: ex is a cumsum in pair order), read off the
    # inclusive cumsum of an ex-histogram — an MXU one-hot product like
    # the counts histogram, instead of a serial scatter-max
    F3 = int(np.ceil(np.sqrt(wtot + 1)))
    exc = jnp.minimum(ex, wtot)  # ex > last live window: never read
    eh = (exc // F3)[:, None] == jnp.arange(F3, dtype=jnp.int32)
    el = (exc - (exc // F3) * F3)[:, None] == jnp.arange(
        F3, dtype=jnp.int32)
    ehist = jax.lax.dot_general(
        eh.astype(jnp.int8), el.astype(jnp.int8),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(F3 * F3)[:wtot]
    own = jnp.cumsum(ehist, dtype=jnp.int32) - 1
    rec = jnp.take(jnp.stack([fval, ex, send]), own, axis=1)
    wf, we, wsend = rec[0], rec[1], rec[2]
    row = (wf >> 2) + (gidx - we) * win_rows
    # clamp: a window never reads across its stream's end (entries
    # there wouldn't be sorted relative to it)
    rowc = jnp.minimum(jnp.maximum(row, 0), wsend - win_rows)
    if reread_bits:
        reread = jnp.clip(row - rowc, 0, (1 << reread_bits) - 1)
        wrowtile = (
            (rowc << (TPS_BITS + reread_bits)) | (reread << TPS_BITS)
            | (wf & (TPS - 1))
        )
    else:
        wrowtile = (rowc << TPS_BITS) | (wf & (TPS - 1))
    return cumwin, wrowtile, nrows, nprog


def _dense_rows_group(sp2d, sd2d, sy2d, size: int, interpret: bool,
                      ilp: bool, fast_ok=None, clip=None, tile_cols=None,
                      fully_sorted: bool = False, pay_planes: int = 4):
    """One merge-kernel invocation over S equal-width sorted rows.

    `fast_ok` (traced bool) selects the run-length-bounded suffix-scan
    kernel via lax.cond; None always runs the full 10-step kernel.
    `clip` selects the clipped pair-grid table build (caller-verified).
    `fully_sorted` (static) drops the suffix-min entirely (steps=0).
    `pay_planes` (static) is the matscatter payload byte-plane count.
    """
    S, n = sp2d.shape
    ntiles = -(-size // TILE)
    nprog = -(-ntiles // TPS)
    ntiles_pad = nprog * TPS
    matscatter = MERGE_KERNEL == "matscatter"
    wide = 1 if matscatter else (ILP_WIDE if ilp else 1)
    # wcap-bounded table first: the small expansion domain costs ~0.45 ms
    # less at 128x32K (experiments/r3_build_v3.py); cumwin is wcap-
    # independent, so its total window count decides on device whether
    # the small table is complete, falling back to the worst-case-sized
    # build otherwise (rare: >WCAP live (row, tile) pairs in one group)
    cumwin, wrowtile, nrows, nprog = build_rows_window_table(
        sp2d, size, wide, clip=clip, tile_cols=tile_cols, wcap=WCAP
    )

    as_i32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    ).reshape(-1, LANES)
    planes = (as_i32(sp2d), as_i32(sd2d), as_i32(sy2d))
    outspec = pl.BlockSpec((TPS * SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles_pad * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((RING, SUBS, LANES), jnp.int32)

    def call(tables, steps):
        if matscatter:
            kern = partial(_merge_matscatter_kernel, nrows=nrows,
                           wide=wide, suffix_steps=steps,
                           pay_planes=pay_planes)
        elif ilp:
            kern = partial(_merge_nk1_kernel_ilp, nrows=nrows, wide=wide,
                           suffix_steps=steps)
        else:
            kern = partial(_merge_nk1_kernel, nrows=nrows,
                           suffix_steps=steps)
        return pl.pallas_call(
            kern,
            grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[outspec] * 2,
            out_shape=[outshape] * 2,
            scratch_shapes=[win] * 3 + [pltpu.SemaphoreType.DMA((RING, 3))],
            interpret=interpret,
        )(*tables, *planes)

    def resolve_with(tables):
        if fully_sorted:
            return call(tables, 0)
        if fast_ok is None:
            return call(tables, 10)
        return jax.lax.cond(
            fast_ok,
            lambda: call(tables, FAST_SUFFIX_STEPS),
            lambda: call(tables, 10),
        )

    def big_path():
        cw2, wr2, _nr, _np = build_rows_window_table(
            sp2d, size, wide, clip=clip, tile_cols=tile_cols
        )
        return resolve_with((cw2, wr2))

    outd, outp = jax.lax.cond(
        cumwin[-1] < WCAP,
        lambda: resolve_with((cumwin, wrowtile)),
        big_path,
    )

    tou32 = lambda o: jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(
        ntiles_pad * TILE
    )[:size]
    return tou32(outd), tou32(outp)


@partial(jax.jit, static_argnames=("size", "need_depth", "interpret"))
def dense_from_sorted(spid, sdep, spay, size: int, need_depth: bool = True,
                      interpret: bool = False):
    """(sorted pid, depth, payload) -> dense (fb_d, fb_p), EMPTY-filled.

    spid must be sorted ascending with OOB entries (pid >= size) at the
    end; the winner for a pixel is its first entry (the caller's 3-key
    sort guarantees u64-min order).  fb_d is None if not need_depth.
    """
    n = spid.shape[0]
    assert n % TILE == 0, n
    ntiles = -(-size // TILE)
    size_pad = ntiles * TILE

    bounds = jnp.arange(ntiles + 1, dtype=jnp.uint32) * TILE
    starts = jnp.searchsorted(spid, bounds).astype(jnp.int32)
    s0, s1 = starts[:-1], starts[1:]
    # windows start at the 128-entry (one VREG row) boundary at or below
    # the tile's first entry — row granularity wastes at most 127 foreign
    # entries per tile vs up to 1023 for full-window alignment
    first_row = s0 // LANES
    span = s1 - first_row * LANES
    nwin = jnp.where(s1 > s0, (span + TILE - 1) // TILE, 0)

    as_i32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    ).reshape(n // LANES, LANES)
    kern = partial(_merge_kernel, need_depth=need_depth,
                   nrows=n // LANES)
    nplanes = 3 if need_depth else 2
    outspec = pl.BlockSpec((SUBS, LANES), lambda i: (i, 0))
    outshape = jax.ShapeDtypeStruct((ntiles * SUBS, LANES), jnp.int32)
    win = pltpu.VMEM((2, SUBS, LANES), jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        out_specs=[outspec] * (2 if need_depth else 1),
        out_shape=[outshape] * (2 if need_depth else 1),
        scratch_shapes=[win] * nplanes
        + [pltpu.SemaphoreType.DMA((2, nplanes))],
        interpret=interpret,
    )(
        first_row, nwin,
        *([as_i32(spid), as_i32(sdep), as_i32(spay)] if need_depth
          else [as_i32(spid), as_i32(spay)]),
    )
    outd, outp = outs if need_depth else (None, outs[0])

    tou32 = lambda o: jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(
        size_pad
    )[:size]
    fb_p = tou32(outp)
    fb_d = tou32(outd) if need_depth else None
    return fb_d, fb_p
