"""`huffman_tpu_hqs` — HQS over the native format with Pallas decode.

Same three-pass semantics as `huffman_hqs` (reference:
modules/huffman_hqs/) on the tbatch pipeline: depth prepass + 1%-depth-
tolerance average blend + divide resolve, both passes decoding through
the Pallas kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import POINTS_PER_THREAD
from ...engine.debug import Debug
from ..bc1_layout import bc1_payload_native
from ..native_decode_xla import decode_fixed_xla, decode_native_xla
from ..pallas_decode import decode_native_batches
from ..pallas_decode_fixed import decode_fixed_batches
from ..raster import EMPTY
from .huffman_mem_iter import _slice_rows
from .huffman_tpu import CHUNK, HuffmanTpu


def _project_native(dev, chunk_start, transform, lod_n, scale, offset_rel,
                    width, height, use_pallas, fmt="tbatch", tb=None):
    if fmt == "fixed":
        decode = decode_fixed_batches if use_pallas else decode_fixed_xla
        coords = decode(
            _slice_rows(dev["widths"], chunk_start, CHUNK),
            _slice_rows(dev["streams"], chunk_start, CHUNK),
            _slice_rows(dev["ptrs"], chunk_start, CHUNK),
            _slice_rows(dev["starts"], chunk_start, CHUNK),
        )
    else:
        decode = decode_native_batches if use_pallas else decode_native_xla
        coords = decode(
            _slice_rows(dev["lj"], chunk_start, CHUNK),
            _slice_rows(dev["streams"], chunk_start, CHUNK),
            _slice_rows(dev["ptrs"], chunk_start, CHUNK),
            _slice_rows(dev["dD"], chunk_start, CHUNK),
            _slice_rows(dev["lut"], chunk_start, CHUNK),
            _slice_rows(dev["starts"], chunk_start, CHUNK),
        )
    colors = _slice_rows(dev["colors"], chunk_start, CHUNK)
    n_chunk = _slice_rows(lod_n, chunk_start, CHUNK)

    t = transform.astype(jnp.float32)
    if tb is not None:
        anchor = _slice_rows(dev["anchor"], chunk_start, CHUNK)
        tbc = _slice_rows(tb, chunk_start, CHUNK)
        bc = lambda a: a[:, None, None, None]
        xs = (coords[:, :, 0] - bc(anchor[:, 0])).astype(jnp.float32) * scale[0]
        ys = (coords[:, :, 1] - bc(anchor[:, 1])).astype(jnp.float32) * scale[1]
        zs = (coords[:, :, 2] - bc(anchor[:, 2])).astype(jnp.float32) * scale[2]
        cx = t[0, 0] * xs + t[0, 1] * ys + t[0, 2] * zs + bc(tbc[:, 0])
        cy = t[1, 0] * xs + t[1, 1] * ys + t[1, 2] * zs + bc(tbc[:, 1])
        w = t[3, 0] * xs + t[3, 1] * ys + t[3, 2] * zs + bc(tbc[:, 3])
    else:
        xs = coords[:, :, 0].astype(jnp.float32) * scale[0] + offset_rel[0]
        ys = coords[:, :, 1].astype(jnp.float32) * scale[1] + offset_rel[1]
        zs = coords[:, :, 2].astype(jnp.float32) * scale[2] + offset_rel[2]
        cx = t[0, 0] * xs + t[0, 1] * ys + t[0, 2] * zs + t[0, 3]
        cy = t[1, 0] * xs + t[1, 1] * ys + t[1, 2] * zs + t[1, 3]
        w = t[3, 0] * xs + t[3, 1] * ys + t[3, 2] * zs + t[3, 3]
    inv = 1.0 / w  # reciprocal-multiply, matching the Pallas paths
    ndc_x, ndc_y = cx * inv, cy * inv
    shp = xs.shape
    pt_idx = jnp.arange(POINTS_PER_THREAD, dtype=jnp.int32)
    mask = jnp.broadcast_to(
        pt_idx[None, :, None, None] < n_chunk[:, None, None, None], shp
    )
    ok = mask & (w > 0) & (jnp.abs(ndc_x) <= 1) & (jnp.abs(ndc_y) <= 1)
    sx = ((ndc_x * 0.5 + 0.5) * width).astype(jnp.int32)
    sy = ((ndc_y * 0.5 + 0.5) * height).astype(jnp.int32)
    ok &= (sx >= 0) & (sx < width) & (sy >= 0) & (sy < height)
    size = width * height
    pid = jnp.where(ok, sx + sy * width, size).reshape(-1)
    rgba = bc1_payload_native(colors, shp).astype(jnp.uint32).reshape(-1)
    return pid, w.reshape(-1), rgba, ok.reshape(-1)


def _hqs_frame_setup(dev, frame_params, width, height, cull):
    from ..camera import frame_setup_device

    view = frame_params[0:16].reshape(4, 4)
    lod_n = frame_setup_device(
        view, frame_params[16:22], dev["bbox_min"], dev["bbox_max"],
        frame_params[23].astype(jnp.int32), width, height,
        frame_params[22], cull,
    )
    return lod_n, frame_params[24:40].reshape(4, 4)


@partial(
    jax.jit,
    static_argnames=("width", "height", "nchunks", "use_pallas", "cull",
                     "fmt"),
)
def hqs_prepass_native(dev, frame_params, scale, offset_rel,
                       width: int, height: int, nchunks: int,
                       use_pallas: bool, cull: bool, fmt: str = "tbatch",
                       tb=None):
    """HQS stage 1: dense per-pixel min-depth plane.

    Stages 1 and 2 are SEPARATE jit programs on purpose: one fused HQS
    graph is ~2x the color frame's and exceeds the compile service's
    request-size limit at 100M points; each half is the size of the
    color frame, which compiles at every measured scale.
    """
    lod_n, transform = _hqs_frame_setup(dev, frame_params, width, height,
                                        cull)
    size = width * height

    # depth prepass: per-pixel min depth.  On TPU: per-chunk 1-key sorts
    # + the scatter-free multi-stream merge kernel (payload = the depth
    # bits themselves, so the run min IS the min depth); scatter-min on
    # CPU.  Per-chunk work rides in lax.scan so the HLO stays O(1) in
    # scene size (an unrolled 24-chunk 100M frame exceeds what the
    # compile service accepts).
    if use_pallas:
        from ..pallas_merge import dense_from_sorted_nk1_multi

        def prep_body(carry, c):
            pid, w, _rgba, _ok = _project_native(
                dev, c * CHUNK, transform, lod_n, scale, offset_rel,
                width, height, use_pallas, fmt, tb,
            )
            depth = jax.lax.bitcast_convert_type(w, jnp.uint32)
            sp, sd = jax.lax.sort([pid.astype(jnp.uint32), depth],
                                  num_keys=1, is_stable=False)
            return carry, (sp, sd)

        _c, (sps, sds) = jax.lax.scan(
            prep_body, 0, jnp.arange(nchunks, dtype=jnp.int32)
        )
        # payload = the depth bits themselves
        _none, fb_depth = dense_from_sorted_nk1_multi(
            [(sps[c], sds[c], sds[c]) for c in range(nchunks)], size, False
        )
    else:
        prepass = []
        for c in range(nchunks):
            pid, w, _rgba, _ok = _project_native(
                dev, c * CHUNK, transform, lod_n, scale, offset_rel,
                width, height, use_pallas, fmt, tb,
            )
            depth = jax.lax.bitcast_convert_type(w, jnp.uint32)
            prepass.append((pid, depth))
        cat = lambda xs: jnp.concatenate(xs) if nchunks > 1 else xs[0]
        pid_all = cat([p for p, _ in prepass])
        dep_all = cat([d for _, d in prepass])
        fb_depth = jnp.full((size,), EMPTY, jnp.uint32)
        fb_depth = fb_depth.at[pid_all].min(dep_all, mode="drop")
    return fb_depth


@partial(
    jax.jit,
    static_argnames=("width", "height", "nchunks", "use_pallas", "cull",
                     "fmt"),
)
def hqs_blend_native(dev, frame_params, scale, offset_rel, fb_depth,
                     width: int, height: int, nchunks: int,
                     use_pallas: bool, cull: bool, fmt: str = "tbatch",
                     tb=None):
    """HQS stage 2: tolerance-gated (r,g,b,count) sums + divide resolve."""
    lod_n, transform = _hqs_frame_setup(dev, frame_params, width, height,
                                        cull)
    size = width * height
    if use_pallas:
        # scatter-free accumulation: per-chunk nk1 sorts + the segmented
        # suffix-sum merge kernel with the in-kernel tolerance test (the
        # reference's two i64 atomicAdds, huffman_hqs/render.cu:311-313;
        # XLA scatter-add would cost ~4.8 ns/slot)
        from ..pallas_hqs import hqs_sums_from_sorted_multi

        def blend_body(carry, c):
            pid, w, rgba, _ok = _project_native(
                dev, c * CHUNK, transform, lod_n, scale, offset_rel,
                width, height, use_pallas, fmt, tb,
            )
            sp, sd, sy = jax.lax.sort(
                [pid.astype(jnp.uint32),
                 jax.lax.bitcast_convert_type(w, jnp.uint32), rgba],
                num_keys=1, is_stable=False,
            )
            return carry, (sp, sd, sy)

        _c, (bps, bds, bys) = jax.lax.scan(
            blend_body, 0, jnp.arange(nchunks, dtype=jnp.int32)
        )
        acc_r, acc_g, acc_b, acc_n = hqs_sums_from_sorted_multi(
            [(bps[c], bds[c], bys[c]) for c in range(nchunks)],
            fb_depth, size
        )
    else:
        acc_r = jnp.zeros((size,), jnp.uint32)
        acc_g = jnp.zeros((size,), jnp.uint32)
        acc_b = jnp.zeros((size,), jnp.uint32)
        acc_n = jnp.zeros((size,), jnp.uint32)
        for c in range(nchunks):
            pid, w, rgba, ok = _project_native(
                dev, c * CHUNK, transform, lod_n, scale, offset_rel,
                width, height, use_pallas, fmt, tb,
            )
            old = jax.lax.bitcast_convert_type(
                fb_depth[jnp.clip(pid, 0, size - 1)], jnp.float32
            )
            keep = ok & (w <= old * 1.01)
            pid2 = jnp.where(keep, pid, size)
            acc_r = acc_r.at[pid2].add(rgba & 0xFF, mode="drop")
            acc_g = acc_g.at[pid2].add((rgba >> 8) & 0xFF, mode="drop")
            acc_b = acc_b.at[pid2].add((rgba >> 16) & 0xFF, mode="drop")
            acc_n = acc_n.at[pid2].add(jnp.uint32(1), mode="drop")

    cnt = jnp.maximum(acc_n, 1)
    color = (acc_r // cnt) | ((acc_g // cnt) << 8) | ((acc_b // cnt) << 16)
    img = jnp.where(acc_n > 0, color, jnp.uint32(0x00443322)).reshape(height, width)
    return acc_n, img


def hqs_frame_native(dev, frame_params, scale, offset_rel,
                     width: int, height: int, nchunks: int,
                     use_pallas: bool, cull: bool, fmt: str = "tbatch",
                     tb=None):
    """Full HQS frame = prepass + blend, dispatched as TWO jit programs
    (deliberately not jitted itself — see hqs_prepass_native; wrapping
    this in an outer jit would re-inline both into one oversized graph).
    """
    fb_depth = hqs_prepass_native(
        dev, frame_params, scale, offset_rel, width, height, nchunks,
        use_pallas, cull, fmt, tb,
    )
    acc_n, img = hqs_blend_native(
        dev, frame_params, scale, offset_rel, fb_depth, width, height,
        nchunks, use_pallas, cull, fmt, tb,
    )
    return fb_depth, acc_n, img


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
        )
        renderer.last_fb = (fb_depth, acc_n)
        return img
