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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # pixels per grid step == entries per stream window
LANES = 128
SUBS = 8  # TILE // LANES


def _rows_of(x):
    """x (8,128) -> list of 8 (8,128) sublane-broadcasts (one per row).

    Hoisted out of _flat_gather so repeated gathers on the same tile
    (the 10 binary-search probes all hit the pid plane) reuse them.
    """
    return [
        jax.lax.broadcast_in_dim(x[s, :], (SUBS, LANES), (1,))
        for s in range(SUBS)
    ]


def _flat_gather(rows, pos):
    """rows = _rows_of(x); pos (8,128) flat indices in [0,1024) -> x[pos].

    Row-major flat index: entry k lives at (k // 128, k % 128).  TPU has
    no 2-D in-tile gather; compose one lane-gather per source sublane
    and select by row.
    """
    col = jnp.bitwise_and(pos, LANES - 1)
    row = jnp.right_shift(pos, 7)
    out = jnp.zeros((SUBS, LANES), jnp.int32)
    for s in range(SUBS):
        cand = jnp.take_along_axis(rows[s], col, axis=1)
        hit = (row == s).astype(jnp.int32)
        out = (hit * cand) | ((1 - hit) * out)
    return out


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
