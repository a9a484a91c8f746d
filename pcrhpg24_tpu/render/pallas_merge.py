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


def _flat_gather(x, pos):
    """x (8,128) i32, pos (8,128) flat indices in [0,1024) -> x[pos].

    Row-major flat index: entry k lives at (k // 128, k % 128).  TPU has
    no 2-D in-tile gather; compose one lane-gather per source sublane
    and select by row.
    """
    col = jnp.bitwise_and(pos, LANES - 1)
    row = jnp.right_shift(pos, 7)
    out = jnp.zeros_like(x)
    for s in range(SUBS):
        rowdata = jax.lax.broadcast_in_dim(x[s, :], (SUBS, LANES), (1,))
        cand = jnp.take_along_axis(rowdata, col, axis=1)
        hit = (row == s).astype(jnp.int32)
        out = (hit * cand) | ((1 - hit) * out)
    return out


def _merge_kernel(firstwin_ref, nwin_ref, spid_hbm, sdep_hbm, spay_hbm,
                  outd_ref, outp_ref, wpid, wdep, wpay, sems,
                  *, need_depth: bool):
    t = pl.program_id(0)
    base = t * TILE
    empty = jnp.full((SUBS, LANES), -1, jnp.int32)
    outp_ref[...] = empty
    outd_ref[...] = empty

    tgt = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    )

    fw = firstwin_ref[t]
    nw = nwin_ref[t]

    def body(w, found):
        r0 = (fw + w) * SUBS
        cp = pltpu.make_async_copy(
            spid_hbm.at[pl.ds(r0, SUBS), :], wpid, sems.at[0]
        )
        cd = pltpu.make_async_copy(
            sdep_hbm.at[pl.ds(r0, SUBS), :], wdep, sems.at[1]
        )
        ca = pltpu.make_async_copy(
            spay_hbm.at[pl.ds(r0, SUBS), :], wpay, sems.at[2]
        )
        cp.start()
        cd.start()
        ca.start()
        cp.wait()
        pid = wpid[...]

        # lower_bound(pid_sorted_window, tgt) for all 1024 targets:
        # pid values are pixel ids (< 2^31 as i32) except the OOB
        # sentinel `size`, still < 2^31 for any real framebuffer.
        pos = jnp.zeros((SUBS, LANES), jnp.int32)
        for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            probe = _flat_gather(pid, pos + (b - 1))
            pos = pos + (probe < tgt).astype(jnp.int32) * b
        posc = jnp.minimum(pos, TILE - 1)
        hitpid = _flat_gather(pid, posc)
        take = ((hitpid == tgt) & (found == 0)).astype(jnp.int32)
        keep = 1 - take

        cd.wait()
        ca.wait()
        pay = _flat_gather(wpay[...], posc)
        outp_ref[...] = (take * pay) | (keep * outp_ref[...])
        if need_depth:
            dep = _flat_gather(wdep[...], posc)
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
    first_win = s0 // TILE
    last_win = jnp.maximum(s1 - 1, 0) // TILE
    nwin = jnp.where(s1 > s0, last_win - first_win + 1, 0)

    as_i32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    ).reshape(n // LANES, LANES)
    kern = partial(_merge_kernel, need_depth=need_depth)
    outd, outp = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((SUBS, LANES), lambda i: (i, 0)),
            pl.BlockSpec((SUBS, LANES), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * SUBS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ntiles * SUBS, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUBS, LANES), jnp.int32),
            pltpu.VMEM((SUBS, LANES), jnp.int32),
            pltpu.VMEM((SUBS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(first_win, nwin, as_i32(spid), as_i32(sdep), as_i32(spay))

    tou32 = lambda o: jax.lax.bitcast_convert_type(o, jnp.uint32).reshape(
        size_pad
    )[:size]
    fb_p = tou32(outp)
    fb_d = tou32(outd) if need_depth else None
    return fb_d, fb_p
