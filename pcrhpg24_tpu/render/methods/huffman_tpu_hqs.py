"""`huffman_tpu_hqs` — HQS over the native format with Pallas decode.

Same three-pass semantics as `huffman_hqs` (reference:
modules/huffman_hqs/: depth prepass + 1%-depth-tolerance average blend
+ divide resolve, huffman_hqs.h:198-259) on the flagship pipeline —
with one structural improvement the reference's atomics can't express:
the point stream is decoded, projected, and pid-sorted ONCE, and the
sorted rows feed BOTH the min-depth merge (prepass) and the
suffix-sum blend kernel.  The reference decodes everything twice
(depth.cu then render.cu); here the second decode+project+sort is
replaced by one extra kernel pass over the already-sorted stream.

The two stages remain SEPARATE jit programs: one fused HQS graph is
~2x the color frame's and exceeded the compile service's request-size
limit at 100M points (experiments/NOTES.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...engine.debug import Debug
from ..raster import EMPTY, swizzle_dims, unswizzle_plane
from .huffman_tpu import CHUNK, SORT_ROWS, HuffmanTpu, render_chunk_native


def _hqs_frame_setup(dev, frame_params, width, height, cull, points):
    from ..camera import frame_setup_device

    view = frame_params[0:16].reshape(4, 4)
    lod_n = frame_setup_device(
        view, frame_params[16:22], dev["bbox_min"], dev["bbox_max"],
        frame_params[23].astype(jnp.int32), width, height,
        frame_params[22], cull,
    )
    # clamp to the static decode bucket (see render_frame_native)
    lod_n = jnp.minimum(lod_n, points)
    return lod_n, frame_params[24:40].reshape(4, 4)


@partial(
    jax.jit,
    static_argnames=("width", "height", "nchunks", "use_pallas", "cull",
                     "fmt", "points", "color_fmt"),
)
def hqs_prepass_native(dev, frame_params, scale, offset_rel,
                       width: int, height: int, nchunks: int,
                       use_pallas: bool, cull: bool, fmt: str = "tbatch",
                       tb=None, points: int = 64, color_fmt: str = "bc1"):
    """HQS stage 1: decode+project+sort every chunk ONCE.

    Returns (fb_depth, streams): fb_depth is the dense per-pixel
    min-depth plane in the SWIZZLED pid space (reference: depth.cu's
    u32 atomicMin prepass), and streams = (sps, sds, sys) are the
    pid-sorted rows that stage 2 re-uses for the tolerance blend — the
    sort-once-use-twice structure.  On the CPU/XLA fallback streams is
    None and fb_depth comes from a scatter-min.
    """
    lod_n, transform = _hqs_frame_setup(dev, frame_params, width, height,
                                        cull, points)
    _wt, _ht, size = swizzle_dims(width, height)

    if use_pallas:
        from ..pallas_merge import SORT_KEYS, dense_from_sorted_rows

        def prep_body(carry, c):
            pid, dep, pay = render_chunk_native(
                dev, c * CHUNK, transform, lod_n, scale, offset_rel,
                width, height, "hqs", use_pallas, points, fmt, tb,
                color_fmt=color_fmt,
            )
            n = pid.shape[0] // SORT_ROWS
            sp, sd, sy = jax.lax.sort(
                [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
                 dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
                num_keys=SORT_KEYS, is_stable=False, dimension=1,
            )
            return carry, (sp, sd, sy)

        _c, (sps, sds, sys_) = jax.lax.scan(
            prep_body, 0, jnp.arange(nchunks, dtype=jnp.int32)
        )
        nseg = sps.shape[-1]
        sps = sps.reshape(-1, nseg)
        sds = sds.reshape(-1, nseg)
        sys_ = sys_.reshape(-1, nseg)
        # the u64 (depth<<32|payload) min's depth plane IS the min depth
        # (payload tie-breaks never change it) — pay_bits=0 drops all 4
        # payload byte planes from the prepass scatter
        fb_depth, _fb_p = dense_from_sorted_rows(
            sps, sds, sys_, size, need_depth=True, tile_cols=_wt,
            fully_sorted=SORT_KEYS == 3, pay_bits=0,
        )
        return fb_depth, (sps, sds, sys_)

    fb_depth = jnp.full((size,), EMPTY, jnp.uint32)
    for c in range(nchunks):
        pid, dep, _pay = render_chunk_native(
            dev, c * CHUNK, transform, lod_n, scale, offset_rel,
            width, height, "hqs", use_pallas, points, fmt, tb,
            color_fmt=color_fmt,
        )
        fb_depth = fb_depth.at[pid.astype(jnp.int32)].min(dep, mode="drop")
    return fb_depth, None


@partial(
    jax.jit,
    static_argnames=("width", "height", "nchunks", "use_pallas", "cull",
                     "fmt", "points", "color_fmt"),
)
def hqs_blend_native(dev, frame_params, scale, offset_rel, fb_depth,
                     streams, width: int, height: int, nchunks: int,
                     use_pallas: bool, cull: bool, fmt: str = "tbatch",
                     tb=None, points: int = 64, color_fmt: str = "bc1"):
    """HQS stage 2: tolerance-gated (r,g,b,count) sums + divide resolve.

    On the Pallas path `streams` carries stage 1's sorted rows, so this
    stage is ONE kernel pass (segmented suffix-sums with the in-kernel
    depth-tolerance test, the reference's two i64 atomicAdds —
    huffman_hqs/render.cu:311-313) plus the divide.
    """
    _wt, _ht, size = swizzle_dims(width, height)
    if use_pallas:
        from ..pallas_hqs import hqs_sums_from_rows

        sps, sds, sys_ = streams
        acc_r, acc_g, acc_b, acc_n = hqs_sums_from_rows(
            sps, sds, sys_, fb_depth, size, tile_cols=_wt
        )
    else:
        lod_n, transform = _hqs_frame_setup(dev, frame_params, width,
                                            height, cull, points)
        acc_r = jnp.zeros((size,), jnp.uint32)
        acc_g = jnp.zeros((size,), jnp.uint32)
        acc_b = jnp.zeros((size,), jnp.uint32)
        acc_n = jnp.zeros((size,), jnp.uint32)
        for c in range(nchunks):
            pid, dep, rgba = render_chunk_native(
                dev, c * CHUNK, transform, lod_n, scale, offset_rel,
                width, height, "hqs", use_pallas, points, fmt, tb,
                color_fmt=color_fmt,
            )
            pid = pid.astype(jnp.int32)
            w = jax.lax.bitcast_convert_type(dep, jnp.float32)
            old = jax.lax.bitcast_convert_type(
                fb_depth[jnp.clip(pid, 0, size - 1)], jnp.float32
            )
            keep = (pid < size) & (w <= old * 1.01)
            pid2 = jnp.where(keep, pid, size)
            acc_r = acc_r.at[pid2].add(rgba & 0xFF, mode="drop")
            acc_g = acc_g.at[pid2].add((rgba >> 8) & 0xFF, mode="drop")
            acc_b = acc_b.at[pid2].add((rgba >> 16) & 0xFF, mode="drop")
            acc_n = acc_n.at[pid2].add(jnp.uint32(1), mode="drop")

    # back to linear pixel space for the resolve + all external consumers
    acc_r = unswizzle_plane(acc_r, width, height)
    acc_g = unswizzle_plane(acc_g, width, height)
    acc_b = unswizzle_plane(acc_b, width, height)
    acc_n = unswizzle_plane(acc_n, width, height)
    cnt = jnp.maximum(acc_n, 1)
    color = (acc_r // cnt) | ((acc_g // cnt) << 8) | ((acc_b // cnt) << 16)
    img = jnp.where(acc_n > 0, color, jnp.uint32(0x00443322)).reshape(
        height, width
    )
    return acc_n, img


def hqs_frame_native(dev, frame_params, scale, offset_rel,
                     width: int, height: int, nchunks: int,
                     use_pallas: bool, cull: bool, fmt: str = "tbatch",
                     tb=None, points: int = 64, color_fmt: str = "bc1"):
    """Full HQS frame = prepass + blend, dispatched as TWO jit programs
    (deliberately not jitted itself — see hqs_prepass_native; wrapping
    this in an outer jit would re-inline both into one oversized graph).
    Returns (fb_depth, acc_n, img) with fb_depth in LINEAR pixel space.
    """
    fb_depth, streams = hqs_prepass_native(
        dev, frame_params, scale, offset_rel, width, height, nchunks,
        use_pallas, cull, fmt, tb, points, color_fmt,
    )
    acc_n, img = hqs_blend_native(
        dev, frame_params, scale, offset_rel, fb_depth, streams, width,
        height, nchunks, use_pallas, cull, fmt, tb, points, color_fmt,
    )
    return unswizzle_plane(fb_depth, width, height), acc_n, img


class HuffmanTpuHqs(HuffmanTpu):
    def __init__(self, renderer, tpc):
        super().__init__(renderer, tpc)
        self.name = "huffman_tpu_hqs"
        self.description = "HQS average blend, tbatch Pallas decode"

    def render(self, renderer):
        las = self.las
        las.process(renderer)
        W, H = renderer.width, renderer.height
        B = las.num_batches_loaded
        if B == 0:
            return jnp.full((H, W), jnp.uint32(0x00443322))
        if not hasattr(las, "_dev_consts"):
            las._dev_consts = (
                jnp.asarray(las.scale, jnp.float32),
                jnp.asarray(las.offset - las.las_min, jnp.float32),
            )
        scale, offset_rel = las._dev_consts
        cam = renderer.camera
        fp = np.zeros(40, np.float32)
        fp[0:16] = cam.view().astype(np.float32).reshape(-1)
        fp[16:22] = cam.proj_params().astype(np.float32)
        fp[22] = Debug.lod
        fp[23] = float(B)
        fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
        _, lod_full = self.frame_setup(renderer)
        max_lod = int(lod_full.max()) if B else 64
        points = max(16, -(-max_lod // 16) * 16)
        from ..camera import batch_translations

        tb = jnp.asarray(batch_translations(
            (cam.proj() @ cam.view()),
            las.anchor_i[: las.dev["anchor"].shape[0]],
            las.scale, las.offset, las.las_min,
        ))
        fb_depth, acc_n, img = hqs_frame_native(
            las.dev, jnp.asarray(fp), scale, offset_rel, W, H,
            (B + CHUNK - 1) // CHUNK, jax.default_backend() == "tpu",
            Debug.frustum_culling_enabled and Debug.update_frustum,
            "fixed" if getattr(las, "version", 1) == 2 else "tbatch", tb,
            points, getattr(las, "color_fmt", "bc1"),
        )
        renderer.last_fb = (fb_depth, acc_n)
        return img
