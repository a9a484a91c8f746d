"""Pallas TPU kernel: fbatch (fixed-width, `.tpc` v2) geometry decode.

Successor of pallas_decode.py's bucket-Huffman kernel.  Because every
chain's three component widths are fixed (codec/fixed.py), the hot loop
has no canonical-code compare ladder, no bucket-LUT gather, and exactly
ONE refill round per point (vs six):

* refill: all 8 group streams share uniform round bases (encoder pads),
  so the 512-word gather window is 4 aligned (8,128) tile loads at one
  scalar, host-precomputed pointer; per-lane word counts (0..3) turn
  into gather offsets via one exclusive-prefix-sum MXU matmul (the same
  rank trick as v1, reference warp-ballot analogue: render.cu:443-450).
* extract: three fixed-shift field extracts from a 4-word in-register
  window (the reference's per-symbol table decode, render.cu:428-441,
  becomes pure shifts).

Output: absolute int32 grid coords, layout (points, 3, 8, 128) per
batch — identical to the v1 kernel so render methods can swap freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import POINTS_PER_THREAD, TPU_GROUPS_PER_BATCH

G = TPU_GROUPS_PER_BATCH  # 8
LANES = 128
P = POINTS_PER_THREAD  # 64

_U = jnp.uint32
_I = jnp.int32


def _mk_lt():
    """(128,128) strictly-lower-triangular ones, bf16.

    Counts are <= 3 (exact in bf16); the MXU accumulates products in
    f32, so prefix sums up to 384 are exact.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (r < c).astype(jnp.bfloat16)


def _decode_fixed_kernel(
    ptr_ref,  # SMEM (1, 1, 64) i32 uniform round base word index
    width_ref,  # VMEM (1, 3, 8, 128) i32 per-chain component widths
    stream_ref,  # VMEM (1, maxT, 8, 128) u32 tile-transposed group streams
    start_ref,  # VMEM (1, 3, 8, 128) i32 chain start values
    out_ref,  # VMEM (1, points, 3, 8, 128) i32 absolute coords
    rank_ref,  # VMEM scratch (points, 8, 128) i32 per-round gather ranks
    *, points: int, unroll: bool = True,
):
    lt = _mk_lt()
    wx = width_ref[0, 0]
    wy = width_ref[0, 1]
    wz = width_ref[0, 2]
    Wb = wx + wy + wz  # (8,128) bits consumed per point, <= 96

    # With FIXED widths the whole bit-cursor state is closed-form in the
    # step index: bits_i = i*Wb, F(i) = (i*Wb+31)>>5 words fetched after
    # i rounds, window-valid ve_i = F(i) - (i*Wb>>5), refill count
    # cnt_i = F(i+1)-F(i).  Strength-reducing the carried cursor chain
    # (bits/ve/bp/cnt/rank) to these forms leaves only the 4 window
    # registers and the coordinate prefix sums as true loop carries —
    # the refill gathers of consecutive steps become independent and
    # Mosaic can overlap them; fully unrolling the loop then lets the
    # scheduler software-pipeline across steps (decode 1.02 -> 0.61 ->
    # 0.22 ms at 4.2M, experiments/r3_decode_ilp.py, bit-exact).  All
    # `points` gather ranks come from ONE batched MXU prefix matmul up
    # front.
    iP = jax.lax.broadcasted_iota(_I, (points, G, LANES), 0)
    Wb3 = Wb[None]
    F0 = (iP * Wb3 + 31) >> 5
    F1 = ((iP + 1) * Wb3 + 31) >> 5
    rank_ref[...] = jax.lax.dot_general(
        (F1 - F0).astype(jnp.bfloat16), lt, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_I)

    def sel4(k, a, b, c, d):
        """Per-lane 4-way select by k in {0,1,2,3}."""
        lo = jnp.where(k == 0, a, b)
        hi = jnp.where(k == 2, c, d)
        return jnp.where(k < 2, lo, hi)

    def extract(win, off, w):
        """bits [off, off+w) of the 128-bit window (w <= 32) -> u32."""
        w0, w1, w2, w3 = win
        word = off >> 5  # 0..2
        sh = (off & 31).astype(_U)
        lo = sel4(word, w0, w1, w2, w2)
        hi = sel4(word, w1, w2, w3, w3)
        top = (lo << sh) | ((hi >> _U(1)) >> (_U(31) - sh))
        v = top >> ((_I(32) - w) & 31).astype(_U)
        return jnp.where(w > 0, v, _U(0))

    def point_step(i, carry):
        w0, w1, w2, w3, px, py, pz = carry
        bits = i * Wb
        bp = bits & 31
        Fi = (bits + 31) >> 5
        ve = Fi - (bits >> 5)  # words valid in window before refill
        cnt = ((bits + Wb + 31) >> 5) - Fi  # (8,128) 0..3
        rank = rank_ref[i]
        ptr = ptr_ref[0, 0, i]
        tbase = ptr >> 7
        off = ptr - tbase * LANES  # scalar 0..127
        tiles = [stream_ref[0, tbase + k] for k in range(4)]
        idx0 = off + rank
        for j in range(3):
            idx = idx0 + j
            tile = idx >> 7
            pos = idx & (LANES - 1)
            cands = [jnp.take_along_axis(t, pos, axis=1) for t in tiles]
            vj = sel4(tile, *cands)
            take = cnt > j
            slot = ve + j
            w0 = jnp.where(take & (slot == 0), vj, w0)
            w1 = jnp.where(take & (slot == 1), vj, w1)
            w2 = jnp.where(take & (slot == 2), vj, w2)
            w3 = jnp.where(take & (slot == 3), vj, w3)
        # ---- extract x, y, z ----
        win = (w0, w1, w2, w3)
        zx = extract(win, bp, wx)
        zy = extract(win, bp + wx, wy)
        zz = extract(win, bp + wx + wy, wz)
        dx = (zx >> _U(1)).astype(_I) ^ -(zx & _U(1)).astype(_I)
        dy = (zy >> _U(1)).astype(_I) ^ -(zy & _U(1)).astype(_I)
        dz = (zz >> _U(1)).astype(_I) ^ -(zz & _U(1)).astype(_I)
        px = px + dx
        py = py + dy
        pz = pz + dz
        out_ref[0, i, 0] = px
        out_ref[0, i, 1] = py
        out_ref[0, i, 2] = pz
        # ---- advance window (k = words consumed this step) ----
        k = (bp + Wb) >> 5
        w0n = sel4(k, w0, w1, w2, w3)
        w1n = sel4(k, w1, w2, w3, w3)
        w2n = jnp.where(k == 0, w2, w3)
        return w0n, w1n, w2n, w3, px, py, pz

    zu = jnp.zeros((G, LANES), _U)
    init = (zu, zu, zu, zu,
            start_ref[0, 0], start_ref[0, 1], start_ref[0, 2])
    # Mosaic fori_loop supports only unroll=1 or full; full unroll wins
    # (interpret mode keeps unroll=1: a 64x-unrolled trace multiplies the
    # CPU test-compile time without measuring anything).
    jax.lax.fori_loop(0, points, point_step, init,
                      unroll=points if unroll else 1)


@functools.partial(jax.jit, static_argnames=("interpret", "points"))
def decode_fixed_batches(widths, streams, ptrs, starts, interpret=False,
                         points: int = P):
    """widths (B,3,8,128) i32, streams (B,maxT,8,128) u32, ptrs (B,1,64) i32,
    starts (B,3,8,128) i32 -> (B, points, 3, 8, 128) i32 absolute coords.

    `points` < 64 decodes only the first `points` of every chain (the
    LOD loop-trip reduction, render.cu:428)."""
    B = streams.shape[0]
    maxt = streams.shape[1]

    return pl.pallas_call(
        functools.partial(_decode_fixed_kernel, points=points,
                          unroll=not interpret),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, G, LANES), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, maxt, G, LANES), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 3, G, LANES), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, points, 3, G, LANES), lambda b: (b, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, points, 3, G, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((points, G, LANES), jnp.int32)],
        interpret=interpret,
    )(ptrs, widths, streams, starts)


# ---------------------------------------------------------------------------
# Host-side packing of FixedBatch objects into kernel inputs
# ---------------------------------------------------------------------------


def pack_fixed_batches(batches, maxt: int | None = None):
    """[FixedBatch] -> dict of kernel input arrays (NumPy)."""
    B = len(batches)
    if maxt is None:
        nw = max(fb.streams.shape[1] for fb in batches)
        maxt = (nw + LANES - 1) // LANES + 4  # +4: tbase+3 overread pad
    widths = np.zeros((B, 3, G, LANES), np.int32)
    streams = np.zeros((B, maxt, G, LANES), np.uint32)
    ptrs = np.zeros((B, 1, P), np.int32)
    starts = np.zeros((B, 3, G, LANES), np.int32)
    for i, fb in enumerate(batches):
        wv = fb.widths.reshape(G, LANES, 3).astype(np.int32)
        widths[i] = np.transpose(wv, (2, 0, 1))
        nw = fb.streams.shape[1]
        nt = (nw + LANES - 1) // LANES
        st = np.zeros((G, nt * LANES), np.uint32)
        st[:, :nw] = fb.streams
        streams[i, :nt] = st.reshape(G, nt, LANES).transpose(1, 0, 2)
        ptrs[i, 0] = fb.round_ptrs
        sv = fb.start_values.reshape(G, LANES, 3)
        starts[i] = np.transpose(sv, (2, 0, 1))
    return dict(widths=widths, streams=streams, ptrs=ptrs, starts=starts)
