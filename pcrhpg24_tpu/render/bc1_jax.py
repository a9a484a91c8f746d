"""BC1 block decode on device (JAX), mirror of render.cu:23-65."""

from __future__ import annotations

import jax.numpy as jnp


def _expand565(c):
    r5 = (c >> 11) & 31
    g6 = (c >> 5) & 63
    b5 = c & 31
    r = (r5 << 3) | (r5 >> 2)
    g = (g6 << 2) | (g6 >> 4)
    b = (b5 << 3) | (b5 >> 2)
    return r, g, b


def decode_bc1_payload(color_words, point_local_ids):
    """color_words: (..., num_blocks*2) u32; point_local_ids: (...,) i32
    local point index within the same leading batch dims.  Returns u32
    R | G<<8 | B<<16 colors with the reference's exact integer
    interpolation (render.cu:49-62)."""
    pid = point_local_ids.astype(jnp.int32)
    block = pid // 16
    local = pid % 16
    w0 = jnp.take_along_axis(color_words, block * 2, axis=-1).astype(jnp.uint32)
    w1 = jnp.take_along_axis(color_words, block * 2 + 1, axis=-1).astype(jnp.uint32)
    c0 = w0 & 0xFFFF
    c1 = w0 >> 16
    r0, g0, b0 = _expand565(c0)
    r1, g1, b1 = _expand565(c1)
    sel = (w1 >> (2 * local).astype(jnp.uint32)) & 3
    # palette entries 0..3 with integer division semantics
    r = jnp.select(
        [sel == 0, sel == 1, sel == 2],
        [r0, r1, (r0 * 2 + r1) // 3],
        (r0 + r1 * 2) // 3,
    )
    g = jnp.select(
        [sel == 0, sel == 1, sel == 2],
        [g0, g1, (g0 * 2 + g1) // 3],
        (g0 + g1 * 2) // 3,
    )
    b = jnp.select(
        [sel == 0, sel == 1, sel == 2],
        [b0, b1, (b0 * 2 + b1) // 3],
        (b0 + b1 * 2) // 3,
    )
    return r | (g << 8) | (b << 16)
