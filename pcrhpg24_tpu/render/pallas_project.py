"""Pallas TPU kernel: fused projection + BC1 decode + run collapse.

One pass over a decoded chunk replaces the XLA stage of
render_chunk_native (batch-relative projection, NDC clip, BC1 palette
decode, within-chain run collapse — reference semantics:
modules/huffman_mem_iter_cuda/render.cu:276-303 rasterize +
render.cu:23-65 BC1).  The XLA formulation materializes each step
(~2.4 GB of HBM traffic at 4.2M points); this kernel reads coords +
colors once and writes the (pid, depth, payload) stream once.

Bit-exactness with the XLA path is by construction: Mosaic's f32
multiply/divide/casts match XLA's on TPU bit-for-bit
(experiments/r3_div_parity.py: 0 mismatches over randomized inputs),
and all integer ops are exact.  bench.py's resolve gate compares the
full Pallas pipeline against the XLA pipeline image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import POINTS_PER_THREAD, TPU_GROUPS_PER_BATCH

G = TPU_GROUPS_PER_BATCH  # 8
LANES = 128
P = POINTS_PER_THREAD  # 64

_U = jnp.uint32
_I = jnp.int32


def _sel4(k, a, b, c, d):
    lo = jnp.where(k == 0, a, b)
    hi = jnp.where(k == 2, c, d)
    return jnp.where(k < 2, lo, hi)


def _bc1_payload(colors_ref, iota_i, points: int):
    """colors_ref (1,4,2,G,128) u32 -> (points,G,128) u32 R|G<<8|B<<16.

    Same palette math as render/bc1_layout.py (render.cu:23-65): block
    i//16, selector bits 2*(i%16); integer //3 is exact floor on both
    paths.
    """
    blk = iota_i >> 4  # (points,G,128) 0..3
    w0s = [colors_ref[0, k, 0] for k in range(4)]  # (G,128) u32
    w1s = [colors_ref[0, k, 1] for k in range(4)]
    w0 = _sel4(blk, *[w[None] for w in w0s])
    w1 = _sel4(blk, *[w[None] for w in w1s])
    c0 = w0 & _U(0xFFFF)
    c1 = w0 >> _U(16)

    def expand(c):
        r5 = (c >> _U(11)) & _U(31)
        g6 = (c >> _U(5)) & _U(63)
        b5 = c & _U(31)
        return (
            (r5 << _U(3)) | (r5 >> _U(2)),
            (g6 << _U(2)) | (g6 >> _U(4)),
            (b5 << _U(3)) | (b5 >> _U(2)),
        )

    r0, g0, b0 = expand(c0)
    r1, g1, b1 = expand(c1)
    sel = (w1 >> (_U(2) * (iota_i.astype(_U) & _U(15)))) & _U(3)

    def chan(a, b):
        return jnp.where(
            sel == 0, a,
            jnp.where(sel == 1, b,
                      jnp.where(sel == 2, (a * _U(2) + b) // _U(3),
                                (a + b * _U(2)) // _U(3))),
        )

    return chan(r0, r1) | (chan(g0, g1) << _U(8)) | (chan(b0, b1) << _U(16))


def _project_kernel(
    frame_ref,  # SMEM (12,) f32: t00 t01 t02 t10 t11 t12 t30 t31 t32 sx sy sz
    anchor_ref,  # SMEM (1, 1, 3) i32 per-batch anchor
    tbc_ref,  # SMEM (1, 1, 4) f32 per-batch folded translation columns
    lodn_ref,  # SMEM (1, 1, 1) i32 per-batch decoded points per chain
    coords_ref,  # VMEM (1, points, 3, G, 128) i32
    colors_ref,  # VMEM (1, 4, 2, G, 128) u32 BC1 blocks, kernel layout
    pid_ref,  # VMEM (1, points, G, 128) u32 out
    dep_ref,  # VMEM (1, points, G, 128) u32 out
    pay_ref,  # VMEM (1, points, G, 128) u32 out
    *, width: int, height: int, points: int, steps: int,
    chain_collapse: bool, collapse: bool,
):
    # swizzled 32x32-px tile id space (render/raster.py swizzle_pid)
    wt = -(-width // 32)
    ht = -(-height // 32)
    sent = _U(wt * ht * 1024)
    n = lodn_ref[0, 0, 0]
    t00, t01, t02 = frame_ref[0], frame_ref[1], frame_ref[2]
    t10, t11, t12 = frame_ref[3], frame_ref[4], frame_ref[5]
    t30, t31, t32 = frame_ref[6], frame_ref[7], frame_ref[8]
    sx, sy, sz = frame_ref[9], frame_ref[10], frame_ref[11]
    ax, ay, az = (anchor_ref[0, 0, 0], anchor_ref[0, 0, 1],
                  anchor_ref[0, 0, 2])
    tb0, tb1, tb3 = tbc_ref[0, 0, 0], tbc_ref[0, 0, 1], tbc_ref[0, 0, 3]

    xs = (coords_ref[0, :, 0] - ax).astype(jnp.float32) * sx  # (pts,G,128)
    ys = (coords_ref[0, :, 1] - ay).astype(jnp.float32) * sy
    zs = (coords_ref[0, :, 2] - az).astype(jnp.float32) * sz
    cx = t00 * xs + t01 * ys + t02 * zs + tb0
    cy = t10 * xs + t11 * ys + t12 * zs + tb1
    w = t30 * xs + t31 * ys + t32 * zs + tb3
    inv = 1.0 / w
    ndc_x = cx * inv
    ndc_y = cy * inv
    iota_i = jax.lax.broadcasted_iota(_I, (points, G, LANES), 0)
    ok = (iota_i < n) & (w > 0) & (jnp.abs(ndc_x) <= 1) & (jnp.abs(ndc_y) <= 1)
    px = ((ndc_x * 0.5 + 0.5) * width).astype(_I)
    py = ((ndc_y * 0.5 + 0.5) * height).astype(_I)
    ok &= (px >= 0) & (px < width) & (py >= 0) & (py < height)
    swz = (((py >> 5) * wt + (px >> 5)) << 10) | ((py & 31) << 5) | (px & 31)
    pid = jnp.where(ok, swz.astype(_U), sent)
    d = jax.lax.bitcast_convert_type(w, _U)
    p = _bc1_payload(colors_ref, iota_i, points)

    if not collapse:
        # HQS blend streams: every surviving point contributes to the
        # per-pixel sums, so no run collapse and no head retirement
        pid_ref[0] = pid
        dep_ref[0] = d
        pay_ref[0] = p
        return

    # within-chain run collapse (exact same semantics as the XLA path in
    # render_chunk_native: shifted compares along the point axis, pad ->
    # sentinel; then non-head entries retire to the sentinel).  Rolls run
    # on the flattened (points*G, 128) sublane space; a roll by s*G rows
    # equals a circular point-axis shift by s (uniform stride, g intact).
    def shup(a, fill, s):
        flat = a.reshape(points * G, LANES)
        r = pltpu.roll(flat, shift=(points - s) * G, axis=0)
        return jnp.where(iota_i < points - s, r.reshape(points, G, LANES),
                         fill)

    s = 1
    while s < min(points, 1 << steps):
        pid_s = shup(pid, sent, s)
        d_s = shup(d, _U(0), s)
        p_s = shup(p, _U(0), s)
        valid = pid_s == pid
        less = (d_s < d) | ((d_s == d) & (p_s < p))
        take = valid & less
        d = jnp.where(take, d_s, d)
        p = jnp.where(take, p_s, p)
        s *= 2
    prev = pltpu.roll(pid.reshape(points * G, LANES), shift=G, axis=0)
    prev = jnp.where(iota_i == 0, sent, prev.reshape(points, G, LANES))
    head = pid != prev
    pid_out = jnp.where(head, pid, sent)
    pid_ref[0] = pid_out
    dep_ref[0] = d
    pay_ref[0] = p

    if chain_collapse:
        # Chain-level collapse on the i=0 slice: Morton-adjacent chains
        # often start on the same pixel when batches project small
        # (zoomed out / heavy overdraw), leaving one surviving head per
        # CHAIN after the within-chain ladder.  Fold those heads across
        # chains c -> c+2^j (c = g*128+l) — the full 10-step ladder
        # covers all 1024 chains, so the retire rule below is exact: a
        # retired (i=0, c) entry's min was folded into (i=0, c-1) or an
        # earlier surviving chain head.  ~120 vector ops per batch.
        pid0, d0, p0 = pid[0], d[0], p[0]  # (G, 128)
        c_iota = (
            jax.lax.broadcasted_iota(_I, (G, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(_I, (G, LANES), 1)
        )

        def cshift(a, k, fill):
            """out[c] = a[c+k] (c = g*128+l row-major), tail -> fill."""
            if k % LANES == 0:
                r = pltpu.roll(a, shift=G - (k // LANES), axis=0)
            else:
                t1 = pltpu.roll(a, shift=LANES - k, axis=1)
                t2 = pltpu.roll(t1, shift=G - 1, axis=0)
                lcol = jax.lax.broadcasted_iota(_I, (G, LANES), 1)
                r = jnp.where(lcol < LANES - k, t1, t2)
            return jnp.where(c_iota < G * LANES - k, r, fill)

        k = 1
        while k < G * LANES:
            pid_s = cshift(pid0, k, sent)
            d_s = cshift(d0, k, _U(0))
            p_s = cshift(p0, k, _U(0))
            valid = pid_s == pid0
            less = (d_s < d0) | ((d_s == d0) & (p_s < p0))
            take = valid & less
            d0 = jnp.where(take, d_s, d0)
            p0 = jnp.where(take, p_s, p0)
            k *= 2
        t1 = pltpu.roll(pid0, shift=1, axis=1)  # [g,l] = pid0[g, l-1]
        t2 = pltpu.roll(t1, shift=1, axis=0)  # l==0 col: from g-1, l=127
        lcol = jax.lax.broadcasted_iota(_I, (G, LANES), 1)
        prevc = jnp.where(c_iota == 0, sent, jnp.where(lcol > 0, t1, t2))
        chead = pid0 != prevc
        pid_ref[0, 0] = jnp.where(chead, pid0, sent)
        dep_ref[0, 0] = d0
        pay_ref[0, 0] = p0


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "points", "steps", "chain_collapse",
                     "collapse", "interpret"),
)
def project_batches(
    coords, colors_k, anchors, tbc, lodn, frame,
    width: int, height: int, points: int = P, steps: int = 6,
    chain_collapse: bool = True, collapse: bool = True,
    interpret: bool = False,
):
    """Fused projection for a chunk of decoded batches.

    coords (C, points, 3, G, 128) i32 absolute grid coords (decode out),
    colors_k (C, 4, 2, G, 128) u32 BC1 blocks in kernel layout,
    anchors (C, 3) i32, tbc (C, 4) f32 folded translations,
    lodn (C,) i32 decoded points/chain, frame (12,) f32 scalars
    (wvp rows 0/1/3 by columns 0..2, then scale xyz).
    Returns (pid, dep, pay), each (C, points, G, 128) u32 — pid is in
    the SWIZZLED 32x32-px tile id space (raster.swizzle_pid) and
    carries the OOB sentinel swizzle_dims(w,h)[2] for clipped/masked/
    collapsed entries.
    """
    C = coords.shape[0]
    kern = functools.partial(
        _project_kernel, width=width, height=height, points=points,
        steps=steps, chain_collapse=chain_collapse and collapse,
        collapse=collapse,
    )
    out_shape = jax.ShapeDtypeStruct((C, points, G, LANES), _U)
    outs = pl.pallas_call(
        kern,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, points, 3, G, LANES), lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, 4, 2, G, LANES), lambda b: (b, 0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, points, G, LANES), lambda b: (b, 0, 0, 0))
        ] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(frame, anchors[:, None, :], tbc[:, None, :],
      lodn[:, None, None], coords, colors_k)
    return outs


def colors_kernel_layout(colors):
    """(B, 8192) u32 BC1 rows -> (B, 4, 2, G, 128) kernel layout.

    Word order in a row: ((g*128 + l)*4 + blk)*2 + word
    (render/bc1_layout.py native layout).
    """
    B = colors.shape[0]
    return colors.reshape(B, G, LANES, 4, 2).transpose(0, 3, 4, 1, 2)
