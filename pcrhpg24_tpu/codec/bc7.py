"""BC7 mode-6 color block codec, NumPy-vectorized.

The decoder mirrors the reference GPU decoder bit-for-bit
(reference: modules/huffman_mem_iter_cuda/render.cu:67-154 decode_bc7):
7-bit endpoints + shared p-bits, 4-bit indices with weight
round(idx * 64 / 15), including its anchor-index quirk (index 0 is read
as `(hi >> 0) & 0xF` = p1 | s00 << 1, i.e. the 3-bit anchor arrives
doubled).  The encoder is our own (the reference vendors bc7enc,
src/bc7enc.cpp) and accounts for that quirk by storing s00 = idx0 >> 1.

Block: 16 bytes = u64 lo | u64 hi
  lo: mode(7)=0x40 | r0:7 r1:7 g0:7 g1:7 b0:7 b1:7 a0:7 a1:7 | p0:1
  hi: p1:1 | s00:3 | s10:4 ... s33:4
"""

from __future__ import annotations

import numpy as np

_W = np.round(np.arange(16) * 64.0 / 15.0).astype(np.int64)  # linspace_idx


def encode_bc7(colors_rgba: np.ndarray) -> np.ndarray:
    """(N,) u32 R|G<<8|B<<16 -> (N/16 * 4,) u32 blocks (mode 6)."""
    n = len(colors_rgba)
    assert n % 16 == 0
    nb = n // 16
    c = colors_rgba.astype(np.uint32)
    rgb = np.stack([c & 255, (c >> 8) & 255, (c >> 16) & 255], -1)
    blocks = rgb.reshape(nb, 16, 3).astype(np.float64)

    lo = blocks.min(axis=1)
    hi = blocks.max(axis=1)
    axis = hi - lo
    norm = np.linalg.norm(axis, axis=-1, keepdims=True)
    axis = np.where(norm > 0, axis / np.maximum(norm, 1e-9), 1.0)
    proj = np.einsum("bpc,bc->bp", blocks, axis)
    bi = np.arange(nb)
    e0 = blocks[bi, np.argmin(proj, axis=1)]
    e1 = blocks[bi, np.argmax(proj, axis=1)]

    def quant(e):  # 8-bit value -> (7-bit field, p-bit)
        v = np.clip(np.round(e), 0, 255).astype(np.int64)
        return v >> 1, v & 1

    out = np.zeros(nb * 4, np.uint32)
    for b in range(nb):
        c0_7, p0bits = quant(e0[b])
        c1_7, _ = quant(e1[b])
        p0 = int(np.round(p0bits.mean()))  # shared p bit, majority
        p1 = 0

        def expand(c7, p):
            return (c7 << 1) | p

        pal = np.stack(
            [
                (
                    (expand(c0_7, p0) * (64 - w) + expand(c1_7, p1) * w + 32) >> 6
                )
                for w in _W
            ]
        )  # (16 weights, 3)
        d = blocks[b][:, None, :] - pal[None, :, :]
        idx = np.argmin((d * d).sum(-1), axis=1).astype(np.int64)  # (16,)

        # anchor quirk: the stored 3 bits decode as idx0 = 2*s00, so
        # store the nearest even index (max weight error: 1/15 step)
        s00 = int(idx[0]) >> 1

        lo64 = 0x40  # mode 6
        shift = 7
        for v in (c0_7[0], c1_7[0], c0_7[1], c1_7[1], c0_7[2], c1_7[2], 0, 0):
            lo64 |= int(v) << shift
            shift += 7
        lo64 |= p0 << 63
        hi64 = (p1) | (s00 << 1)
        for i in range(1, 16):
            hi64 |= int(idx[i]) << (4 * i)

        out[b * 4 + 0] = lo64 & 0xFFFFFFFF
        out[b * 4 + 1] = (lo64 >> 32) & 0xFFFFFFFF
        out[b * 4 + 2] = hi64 & 0xFFFFFFFF
        out[b * 4 + 3] = (hi64 >> 32) & 0xFFFFFFFF
    return out


def decode_bc7(blocks: np.ndarray, point_ids: np.ndarray) -> np.ndarray:
    """Mirror of render.cu:122-154 (incl. the anchor doubling quirk)."""
    pid = np.asarray(point_ids, np.int64)
    block_id = pid // 16
    local = pid % 16
    w = blocks.astype(np.uint64)
    lo = w[block_id * 4] | (w[block_id * 4 + 1] << np.uint64(32))
    hi = w[block_id * 4 + 2] | (w[block_id * 4 + 3] << np.uint64(32))

    def fld(x, off, n):
        return ((x >> np.uint64(off)) & np.uint64((1 << n) - 1)).astype(np.int64)

    p0 = fld(lo, 63, 1)
    p1 = fld(hi, 0, 1)
    r0 = (fld(lo, 7, 7) << 1) | p0
    r1 = (fld(lo, 14, 7) << 1) | p1
    g0 = (fld(lo, 21, 7) << 1) | p0
    g1 = (fld(lo, 28, 7) << 1) | p1
    b0 = (fld(lo, 35, 7) << 1) | p0
    b1 = (fld(lo, 42, 7) << 1) | p1

    idx = ((hi >> (np.uint64(4) * local.astype(np.uint64))) & np.uint64(0xF)).astype(np.int64)
    idx = np.where(idx == 0, idx >> 1, idx)  # render.cu:143 (no-op quirk)
    wgt = _W[idx]
    iw = 64 - wgt

    r = (r0 * iw + r1 * wgt + 32) >> 6
    g = (g0 * iw + g1 * wgt + 32) >> 6
    b = (b0 * iw + b1 * wgt + 32) >> 6
    return (
        (r & 0xFF).astype(np.uint32)
        | ((g & 0xFF).astype(np.uint32) << 8)
        | ((b & 0xFF).astype(np.uint32) << 16)
    )
