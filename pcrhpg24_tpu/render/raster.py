"""Point rasterization with exact 64-bit depth-test semantics, in JAX.

The reference rasterizes with a u64 atomicMin per pixel over keys
`(f32_bits(clip.w) << 32) | payload` (reference: modules/
huffman_mem_iter_cuda/render.cu:276-303).  TPUs have no atomics; we get
the identical winner with two u32 scatter-min passes:

  1. scatter-min of depth bits per pixel,
  2. scatter-min of payload restricted to points whose depth equals the
     per-pixel minimum.

u64 min picks (min depth, then min payload among min-depth points) —
exactly what the two passes compute.  This is the XLA path (correct,
moderate speed); the Pallas sort-merge path is the performance path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EMPTY = jnp.uint32(0xFFFFFFFF)
BACKGROUND = jnp.uint32(0x00443322)  # resolve.cu:166

# Swizzled pixel-id space: the flagship resolve works in units of
# 32x32-px screen tiles (1024 px = one merge-kernel window unit) instead
# of linear y*W+x ids.  Linear ids make a resolve "tile" (1024
# consecutive ids) half a scanline, so a Morton-compact point cluster
# covering a WxH screen region touches ~H strip-tiles; square tiles cut
# the merge kernel's window count ~3-8x (experiments/r3_windows.py) and
# make per-stream spans compact enough for segmented sorts.
TILE_PX = 32  # tile edge; TILE_PX**2 == pallas_merge.TILE


def swizzle_dims(width: int, height: int):
    """-> (tiles_x, tiles_y, swizzled id space size)."""
    wt = -(-width // TILE_PX)
    ht = -(-height // TILE_PX)
    return wt, ht, wt * ht * TILE_PX * TILE_PX


def swizzle_pid(px, py, width: int):
    """Pixel coords -> swizzled id ((ty*wt+tx)<<10 | ly<<5 | lx)."""
    wt = -(-width // TILE_PX)
    return (
        (((py >> 5) * wt + (px >> 5)) << 10) | ((py & 31) << 5) | (px & 31)
    )


def unswizzle_plane(fb, width: int, height: int):
    """Swizzled (wt*ht*1024,) plane -> linear (height*width,) plane."""
    wt, ht, _ = swizzle_dims(width, height)
    img = fb.reshape(ht, wt, TILE_PX, TILE_PX).transpose(0, 2, 1, 3)
    return img.reshape(ht * TILE_PX, wt * TILE_PX)[:height, :width].reshape(-1)


def swizzle_plane(fb, width: int, height: int, fill):
    """Linear (height*width,) plane -> swizzled (wt*ht*1024,) plane;
    pad pixels beyond the screen get `fill` (e.g. EMPTY for a depth
    plane: nothing ever lands there, and they never unswizzle back)."""
    wt, ht, _ = swizzle_dims(width, height)
    img = fb.reshape(height, width)
    img = jnp.pad(img, ((0, ht * TILE_PX - height), (0, wt * TILE_PX - width)),
                  constant_values=fill)
    return img.reshape(ht, TILE_PX, wt, TILE_PX).transpose(0, 2, 1, 3).reshape(-1)


def project(positions, transform):
    """positions (N,3) f32, transform (4,4) f32 -> clip (N,4).

    Written as explicit VPU multiply-adds: a matmul here would route
    through the MXU at bf16 default precision on TPU and destroy the
    depth bits.
    """
    t = transform.astype(jnp.float32)
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    cols = [t[i, 0] * x + t[i, 1] * y + t[i, 2] * z + t[i, 3] for i in range(4)]
    return jnp.stack(cols, axis=-1)


def scatter_u64_min(pid, depth, payload, size: int):
    """Exact u64 (depth<<32|payload) scatter-min via two u32 passes.

    pid: (N,) i32 pixel ids with out-of-range == dropped; depth/payload
    u32.  Returns (fb_depth, fb_payload) each (size,) u32 initialized to
    EMPTY (the reference clears the fb to 0xFF bytes,
    huffman_mem_iter_cuda.h:250).
    """
    fb_depth = jnp.full((size,), EMPTY, jnp.uint32)
    fb_depth = fb_depth.at[pid].min(depth, mode="drop")
    ok = (pid >= 0) & (pid < size)
    winner = ok & (depth == fb_depth[jnp.clip(pid, 0, size - 1)])
    pid2 = jnp.where(winner, pid, size)
    fb_payload = jnp.full((size,), EMPTY, jnp.uint32)
    fb_payload = fb_payload.at[pid2].min(payload, mode="drop")
    return fb_depth, fb_payload


@partial(jax.jit, static_argnames=("width", "height"))
def rasterize(positions, payload, transform, width: int, height: int, mask=None):
    """Scatter points into (H*W,) u32 depth + payload framebuffers.

    positions: (N,3) f32 in render frame; payload: (N,) u32; transform:
    (4,4) worldViewProj.  Returns (fb_depth, fb_payload) flattened row-
    major, y-up (GL convention; flip when exporting images).
    """
    clip = project(positions, transform)
    w = clip[:, 3]
    ndc_x = clip[:, 0] / w
    ndc_y = clip[:, 1] / w
    # accept test, render.cu:296
    ok = (w > 0) & (ndc_x >= -1) & (ndc_x <= 1) & (ndc_y >= -1) & (ndc_y <= 1)
    if mask is not None:
        ok &= mask
    px = ((ndc_x * 0.5 + 0.5) * width).astype(jnp.int32)
    py = ((ndc_y * 0.5 + 0.5) * height).astype(jnp.int32)
    ok &= (px >= 0) & (px < width) & (py >= 0) & (py < height)
    pid = jnp.where(ok, px + py * width, width * height)
    depth = jax.lax.bitcast_convert_type(w, jnp.uint32)
    return scatter_u64_min(pid, depth, payload, width * height)


def sorted_scatter_u64_min(pid, depth, payload, size: int, fb_d, fb_p):
    """Exact u64 (depth<<32|payload) resolve via 3-key sort + head dedup.

    Lexicographic sort puts each pixel's winner first in its run; one
    plain unique-target scatter per plane then lands it.  ~2x faster on
    TPU than two scatter-mins + a winner gather (experiments/NOTES.md);
    semantics identical to scatter_u64_min (asserted in tests).
    Out-of-range pids (masked points) sort to the end and drop.
    """
    spid, sdep, spay = jax.lax.sort(
        [pid.astype(jnp.uint32), depth, payload], num_keys=3, is_stable=False
    )
    head = jnp.concatenate([jnp.ones(1, bool), spid[1:] != spid[:-1]]) & (
        spid < size
    )
    tgt = jnp.where(head, spid, jnp.uint32(size)).astype(jnp.int32)
    cd = jnp.full((size,), EMPTY, jnp.uint32).at[tgt].set(sdep, mode="drop")
    cp = jnp.full((size,), EMPTY, jnp.uint32).at[tgt].set(spay, mode="drop")
    better = (cd < fb_d) | ((cd == fb_d) & (cp < fb_p))
    return jnp.where(better, cd, fb_d), jnp.where(better, cp, fb_p)


def sorted_resolve_u64_min_parts(parts, size: int, need_depth: bool = True,
                                 use_pallas: bool = False,
                                 presorted: bool = False):
    """Whole-frame exact u64-min resolve from PER-CHUNK streams.

    parts: list of (pid, depth, payload) triples.  On the Pallas path
    each chunk is nk1-sorted independently (XLA sort cost grows
    superlinearly — 1.3 ms at 4.2M vs 18.7 ms at 16.7M — and Morton
    chunks are spatially compact, so per-chunk sorting is strictly
    cheaper) and the merge kernel min-combines all streams per tile.
    presorted: the caller already nk1-sorted each triple by pid (u32),
    e.g. inside its per-chunk lax.scan; skip the sorts here.  The
    fallback path is unaffected — it re-sorts globally regardless.
    """
    if use_pallas and all(p.shape[0] % 1024 == 0 for p, _d, _y in parts):
        from .pallas_merge import dense_from_sorted_nk1_multi

        sorted_parts = parts if presorted else [
            tuple(jax.lax.sort(
                [pid.astype(jnp.uint32), depth, payload],
                num_keys=1, is_stable=False,
            ))
            for pid, depth, payload in parts
        ]
        return dense_from_sorted_nk1_multi(sorted_parts, size, need_depth)
    cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
    return sorted_resolve_u64_min(
        cat([p for p, _d, _y in parts]),
        cat([d for _p, d, _y in parts]),
        cat([y for _p, _d, y in parts]),
        size, need_depth, use_pallas,
    )


def sorted_resolve_u64_min(pid, depth, payload, size: int,
                           need_depth: bool = True,
                           use_pallas: bool = False):
    """Whole-frame exact u64-min resolve into a fresh framebuffer.

    Same winner semantics as sorted_scatter_u64_min, but for the case
    where ALL of a frame's points are resolved in one pass (no running
    fb to merge into).  That makes the dense depth plane optional: the
    depth bits still participate in the sort (so the payload winner is
    exact), but when `need_depth` is False the ~size-proportional depth
    scatter — measured at ~40% of the whole frame on TPU — is skipped
    and fb_d is returned as None.  The reference has no such option
    because its fb is inherently u64 depth|color (render.cu:276-303);
    on TPU the planes are separate scatters, so color-only frames can
    drop one.
    """
    if use_pallas and pid.shape[0] % 1024 == 0:
        # scatter-free dense construction from a 1-key sort: sorting by
        # pid alone costs 2.4 ms at 4.2M vs 8.4 ms for the 3-key sort
        # (experiments/r2_sort_menu.py); the merge kernel restores exact
        # u64 (depth<<32|payload) min order in-register per window
        from .pallas_merge import dense_from_sorted_nk1

        spid, sdep, spay = jax.lax.sort(
            [pid.astype(jnp.uint32), depth, payload],
            num_keys=1, is_stable=False,
        )
        return dense_from_sorted_nk1(spid, sdep, spay, size, need_depth)
    spid, sdep, spay = jax.lax.sort(
        [pid.astype(jnp.uint32), depth, payload], num_keys=3, is_stable=False
    )
    head = jnp.concatenate([jnp.ones(1, bool), spid[1:] != spid[:-1]]) & (
        spid < size
    )
    tgt = jnp.where(head, spid, jnp.uint32(size)).astype(jnp.int32)
    fb_p = jnp.full((size,), EMPTY, jnp.uint32).at[tgt].set(spay, mode="drop")
    fb_d = (
        jnp.full((size,), EMPTY, jnp.uint32).at[tgt].set(sdep, mode="drop")
        if need_depth
        else None
    )
    return fb_d, fb_p


@partial(jax.jit, static_argnames=("width", "height"))
def resolve(fb_payload, width: int, height: int):
    """Framebuffer -> (H, W) u32 RGBA image (resolve.cu:149-191)."""
    color = jnp.where(fb_payload != EMPTY, fb_payload, BACKGROUND)
    return color.reshape(height, width)


@partial(jax.jit, static_argnames=("width", "height"))
def edl_shade(img, fb_d, width: int, height: int, strength=0.0005):
    """Eye-dome lighting: darken pixels occluded by nearer neighbors.

    Mirrors the reference resolve's EDL block
    (modules/compute_loop_las/resolve.cs:143-188): per pixel, sum
    max(0, depth - neighbourDepth) over the 3x3 neighborhood, response
    = sum/9, shade = exp(-response * 300 * strength), RGB *= shade.
    Empty neighbors contribute no occlusion (depth +inf); empty pixels
    keep the background color.  `img` (H, W) u32, `fb_d` (W*H,) u32
    depth bits in LINEAR pixel space.
    """
    bits = fb_d.reshape(height, width)
    d = jax.lax.bitcast_convert_type(bits, jnp.float32)
    empty = bits == EMPTY
    d = jnp.where(empty, jnp.inf, d)
    pad = jnp.pad(d, 1, constant_values=jnp.inf)
    s = jnp.zeros_like(d)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            nb = pad[1 + oy : 1 + oy + height, 1 + ox : 1 + ox + width]
            s = s + jnp.maximum(0.0, d - nb)
    shade = jnp.exp(-(s / 9.0) * 300.0 * jnp.float32(strength))
    ch = lambda sh: jnp.minimum(
        ((img >> sh) & 0xFF).astype(jnp.float32) * shade, 255.0
    ).astype(jnp.uint32)
    shaded = ch(0) | (ch(8) << 8) | (ch(16) << 16)
    return jnp.where(empty, img, shaded)


def image_to_rgb8(image_u32):
    """(H,W) u32 (R | G<<8 | B<<16) -> (H,W,3) u8, flipped to y-down."""
    img = image_u32[::-1]
    r = (img & 0xFF).astype(jnp.uint8)
    g = ((img >> 8) & 0xFF).astype(jnp.uint8)
    b = ((img >> 16) & 0xFF).astype(jnp.uint8)
    return jnp.stack([r, g, b], axis=-1)
