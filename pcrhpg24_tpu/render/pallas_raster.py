"""Pallas TPU raster compaction: per-tile sort + dedup of point fragments.

The exact (depth<<32|payload) framebuffer needs a scatter-min, and XLA's
TPU scatter runs at ~0.14 Gelem/s regardless of how many updates are
masked out (measured, experiments/NOTES.md).  This kernel exploits the
Morton screen coherence of batches to shrink the scatter *volume*:

  per (8,128) tile of 1024 fragments (pid, depth, payload):
    1. bitonic-sort lexicographically by (pid, depth, payload) using
       cross-lane/sublane `pltpu.roll` partner exchanges,
    2. run heads (first fragment of each pid run) are the per-pid minima;
       mark the rest dropped,
    3. re-sort by (dropped, position) to compact survivors to the front,
    4. append the tile to a global output at a persistent SMEM cursor,
       advanced by ceil(survivors/128)*128 — the 128-alignment gap
       re-emits stale fragments from the previous tile, which is
       harmless for the downstream min-scatter (duplicates don't change
       a min).

The downstream XLA scatter then touches ~overdraw-factor fewer elements.
Zoomed-out frames (high overdraw) gain the most; worst case (all pids
unique) degrades to the original volume.

STATUS: the tile sort is implemented and bit-correct on TPU, but
`pltpu.roll`-based partner exchanges measure ~9 ns/vector-op, capping
the 3-key sort at 0.11 Gelem/s — no better than the XLA scatter it
would feed.  Next iteration (see memory/round plan): single-key sort of
(pid<<10 | position) at 3x fewer rolls, or MXU permutation-matrix
exchanges on int8 planes (~10x potential).  Kept as a verified building
block; not yet wired into the frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8
TILE = SUBL * LANES  # 1024 fragments per grid step

_I = jnp.int32
_U = jnp.uint32


def _linear_iota():
    s = jax.lax.broadcasted_iota(_I, (SUBL, LANES), 0)
    l = jax.lax.broadcasted_iota(_I, (SUBL, LANES), 1)
    return s * LANES + l


def _partner(x, d):
    """x[i ^ d] for power-of-two d over the linearized (8,128) tile."""
    if d < LANES:
        fwd = pltpu.roll(x, LANES - d, 1)   # out[i] = x[i + d]  (cyclic)
        bwd = pltpu.roll(x, d, 1)           # out[i] = x[i - d]
        lane = jax.lax.broadcasted_iota(_I, (SUBL, LANES), 1)
        return jnp.where((lane & d) == 0, fwd, bwd)
    ds = d // LANES
    fwd = pltpu.roll(x, SUBL - ds, 0)
    bwd = pltpu.roll(x, ds, 0)
    sub = jax.lax.broadcasted_iota(_I, (SUBL, LANES), 0)
    return jnp.where((sub & ds) == 0, fwd, bwd)


def _bitonic_sort3(k0, k1, k2):
    """Sort the 1024 linearized elements by (k0, k1, k2) ascending.

    Standard bitonic network; all compares/permutes are VPU ops.
    """
    i = _linear_iota()
    size = 2
    while size <= TILE:
        d = size // 2
        while d >= 1:
            p0 = _partner(k0, d)
            p1 = _partner(k1, d)
            p2 = _partner(k2, d)
            up = (i & size) == 0  # ascending region
            is_low = (i & d) == 0
            # lexicographic: self > partner ?
            gt = (k0 > p0) | ((k0 == p0) & ((k1 > p1) | ((k1 == p1) & (k2 > p2))))
            lt = (k0 < p0) | ((k0 == p0) & ((k1 < p1) | ((k1 == p1) & (k2 < p2))))
            # want self <= partner where (up == is_low), else self >= partner;
            # boolean select avoids i1-vector `where` (Mosaic truncation limit)
            want_le = up == is_low
            take_partner = (want_le & gt) | (~want_le & lt)
            k0 = jnp.where(take_partner, p0, k0)
            k1 = jnp.where(take_partner, p1, k1)
            k2 = jnp.where(take_partner, p2, k2)
            d //= 2
        size *= 2
    return k0, k1, k2


def _sort_kernel(pid_ref, dep_ref, pay_ref, o0_ref, o1_ref, o2_ref):
    k0, k1, k2 = _bitonic_sort3(
        pid_ref[0].astype(_I),
        dep_ref[0].astype(_I),
        pay_ref[0].astype(_I),
    )
    o0_ref[0] = k0
    o1_ref[0] = k1
    o2_ref[0] = k2


@jax.jit
def tile_sort3(pid, dep, pay):
    """Test entry: sort each (8,128) tile independently.

    pid/dep/pay: (T, 8, 128) i32 (keys compared as signed — callers
    pre-bias u32 keys if the sign bit matters).
    """
    T = pid.shape[0]
    spec = pl.BlockSpec((1, SUBL, LANES), lambda t: (t, 0, 0))
    return pl.pallas_call(
        _sort_kernel,
        grid=(T,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((T, SUBL, LANES), jnp.int32) for _ in range(3)
        ),
    )(pid, dep, pay)
