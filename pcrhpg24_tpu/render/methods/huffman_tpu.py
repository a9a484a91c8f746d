"""`huffman_tpu` — flagship fused decode + rasterize on the native format.

Same per-frame behavior as `huffman_mem_iter` (frustum cull, LOD,
decode every visible batch, exact depth-test raster — reference:
modules/huffman_mem_iter_cuda/), but geometry decodes through the
Pallas kernels — fbatch (`.tpc` v2, render/pallas_decode_fixed.py,
the flagship) or tbatch (v1, render/pallas_decode.py) — and resolves
through within-chain run collapse + per-chunk single-key sorts + the
scatter-free suffix-min merge kernel.  This is the performance method
for TPU.
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
from ..raster import EMPTY, resolve, sorted_resolve_u64_min_parts
from ..camera import frame_setup_device
from .huffman_mem_iter import HuffmanMemIter, _slice_rows

# smaller chunk than the XLA path: bounds Mosaic compile time of the
# per-batch grid and the scatter size (64 batches = 4.2M points/pass)
CHUNK = 64
# sorted-stream rows per chunk (see render_frame_native's chunk_body)
SORT_ROWS = 128


def render_chunk_native(
    dev, chunk_start, transform, lod_n, scale, offset_rel,
    width: int, height: int, mode: str, use_pallas: bool = True,
    points: int = POINTS_PER_THREAD, fmt: str = "tbatch", tb=None,
    nbatches: int = CHUNK, interpret: bool = False,
    chain_collapse: bool = True, color_fmt: str = "bc1",
):
    """Decode + project one chunk; returns flat (pid, depth, payload).

    Chunks no longer resolve individually: each chunk's stream is sorted
    separately and the merge kernel min-combines the streams (exact
    u64-min winners across chunks).
    fmt: "fixed" (v2 fbatch, flagship) or "tbatch" (v1 bucket-Huffman).
    tb: optional (B, 4) f32 per-batch folded translation columns
    (camera.batch_translations) — when given, coordinates are projected
    batch-RELATIVE to dev["anchor"], the TPU equivalent of the
    reference's double-precision close-up path (render.cu:459-461).
    """
    C = nbatches
    if fmt == "fixed":
        decode = decode_fixed_batches if use_pallas else decode_fixed_xla
        dkw = dict(interpret=True) if (use_pallas and interpret) else {}
        coords = decode(
            _slice_rows(dev["widths"], chunk_start, C),
            _slice_rows(dev["streams"], chunk_start, C),
            _slice_rows(dev["ptrs"], chunk_start, C),
            _slice_rows(dev["starts"], chunk_start, C),
            points=points, **dkw,
        )
        if (use_pallas and mode in ("color", "hqs") and tb is not None
                and color_fmt == "bc1"):
            # fused projection+BC1+collapse kernel: one pass instead of
            # the multi-materialization XLA stage below (bit-identical,
            # experiments/r3_div_parity.py + the bench resolve gate).
            # mode "hqs" keeps every point (no run collapse): the blend
            # pass sums ALL tolerance-passing points per pixel.
            from ..pallas_project import project_batches

            t = transform.astype(jnp.float32)
            frame12 = jnp.concatenate(
                [t[0, :3], t[1, :3], t[3, :3], scale[:3]]
            )
            pid, dep, pay = project_batches(
                coords, _slice_rows(dev["colors_k"], chunk_start, C),
                _slice_rows(dev["anchor"], chunk_start, C),
                _slice_rows(tb, chunk_start, C),
                _slice_rows(lod_n, chunk_start, C).astype(jnp.int32),
                frame12, width, height, points=points, interpret=interpret,
                chain_collapse=chain_collapse, collapse=(mode == "color"),
            )
            return pid.reshape(-1), dep.reshape(-1), pay.reshape(-1)
    else:
        decode = decode_native_batches if use_pallas else decode_native_xla
        coords = decode(
            _slice_rows(dev["lj"], chunk_start, C),
            _slice_rows(dev["streams"], chunk_start, C),
            _slice_rows(dev["ptrs"], chunk_start, C),
            _slice_rows(dev["dD"], chunk_start, C),
            _slice_rows(dev["lut"], chunk_start, C),
            _slice_rows(dev["starts"], chunk_start, C),
            points=points,
        )  # (C, points, 3, 8, 128) i32
    colors = _slice_rows(dev["colors"], chunk_start, C)
    n_chunk = _slice_rows(lod_n, chunk_start, C)

    # positions componentwise in the kernel's native layout (C,64,8,128)
    t = transform.astype(jnp.float32)
    if tb is not None:
        # batch-relative precision path: small i32 offsets from the
        # per-batch anchor stay exact in f32; the anchor's world-space
        # contribution arrives pre-folded (f64 on host) in tb
        anchor = _slice_rows(dev["anchor"], chunk_start, C)  # (C, 3) i32
        tbc = _slice_rows(tb, chunk_start, C)  # (C, 4) f32
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

    inv = 1.0 / w  # reciprocal-multiply, matching the fused kernel
    ndc_x = cx * inv
    ndc_y = cy * inv
    shp = xs.shape  # (C, 64, 8, 128)
    pt_idx = jnp.arange(points, dtype=jnp.int32)
    mask = jnp.broadcast_to(
        pt_idx[None, :, None, None] < n_chunk[:, None, None, None], shp
    )
    ok = mask & (w > 0) & (jnp.abs(ndc_x) <= 1) & (jnp.abs(ndc_y) <= 1)
    px = ((ndc_x * 0.5 + 0.5) * width).astype(jnp.int32)
    py = ((ndc_y * 0.5 + 0.5) * height).astype(jnp.int32)
    ok &= (px >= 0) & (px < width) & (py >= 0) & (py < height)
    # swizzled 32x32-px tile id space (raster.swizzle_pid): square tiles
    # keep Morton segments window-compact in the merge kernel
    from ..raster import swizzle_dims, swizzle_pid

    _wt, _ht, size = swizzle_dims(width, height)
    pid = jnp.where(ok, swizzle_pid(px, py, width), size)
    depth = jax.lax.bitcast_convert_type(w, jnp.uint32)

    if mode == "colorize_chunks":
        payload = jnp.broadcast_to(
            (chunk_start + jnp.arange(C)).astype(jnp.uint32)[:, None, None, None], shp
        )
    elif mode == "show_num_points":
        payload = jnp.broadcast_to(
            n_chunk.astype(jnp.uint32)[:, None, None, None], shp
        )
    else:
        from ..bc1_layout import PAYLOAD_NATIVE

        # color decode by format (reference COLOR_COMPRESSION 0|1|7,
        # GPU decoders render.cu:67-154); bc1 additionally has the
        # fused in-kernel decode above
        payload = PAYLOAD_NATIVE[color_fmt](colors, shp, points).astype(
            jnp.uint32)

    # Within-chain run collapse: Morton order makes consecutive points of
    # a chain (axis 1) land on the same pixel, especially zoomed out.
    # Collapse each such run to its exact u64 (depth<<32|payload) min and
    # retire the rest to the OOB sentinel: they sort to the stream tail,
    # which the merge kernel never visits, shrinking its window count by
    # the run factor.  Bit-exact: only same-pixel candidates collapse,
    # and their min is kept.  (The reference needs no analogue — its
    # atomicMin absorbs duplicates in silicon, render.cu:276-303.)
    if mode == "color":
        d, p = depth, payload
        for s in (1, 2, 4, 8, 16, 32):
            if s >= points:
                break
            pad = [(0, 0), (0, s), (0, 0), (0, 0)]
            pid_s = jnp.pad(pid, pad, constant_values=size)[:, s:]
            d_s = jnp.pad(d, pad)[:, s:]
            p_s = jnp.pad(p, pad)[:, s:]
            valid = pid_s == pid
            less = (d_s < d) | ((d_s == d) & (p_s < p))
            take = valid & less
            d = jnp.where(take, d_s, d)
            p = jnp.where(take, p_s, p)
        prev = jnp.pad(pid, [(0, 0), (1, 0), (0, 0), (0, 0)],
                       constant_values=size)[:, :points]
        head = pid != prev
        pid = jnp.where(head, pid, size)
        depth, payload = d, p

    return pid.reshape(-1), depth.reshape(-1), payload.reshape(-1)


@partial(
    jax.jit,
    static_argnames=("width", "height", "mode", "use_pallas", "nchunks",
                     "cull", "points", "need_depth", "fmt", "color_fmt"),
)
def render_frame_native(
    dev, frame_params, scale, offset_rel,
    width: int, height: int, mode: str, nchunks: int, use_pallas: bool,
    cull: bool, points: int = POINTS_PER_THREAD, need_depth: bool = True,
    fmt: str = "tbatch", tb=None, color_fmt: str = "bc1",
):
    """Whole frame in one dispatch: cull/LOD + chunks + one global resolve.

    frame_params: (40,) f32 — view(16) | proj_params(6) | lod_floor | B |
    wvp(16, host-computed in f64 then cast: keeps depth bits identical to
    the host-transform methods) — the frame's only host->device transfer.

    `need_depth=False` skips the dense depth-plane scatter (~40% of the
    frame at 4M points); the image is bit-identical either way, only
    fb_d comes back as None.  Interactive color frames use False; HQS,
    depth dumps, and exactness tests use True.
    """
    view = frame_params[0:16].reshape(4, 4)
    proj_params = frame_params[16:22]
    lod_n = frame_setup_device(
        view, proj_params, dev["bbox_min"], dev["bbox_max"],
        frame_params[23].astype(jnp.int32), width, height,
        frame_params[22], cull,
    )
    # the decode bucket `points` comes from the host f64 LOD; the device
    # f32 LOD could exceed it by one ulp at a bucket boundary, which would
    # silently mask-in points the kernel never decoded — clamp so the
    # static bucket is authoritative either way
    lod_n = jnp.minimum(lod_n, points)
    transform = frame_params[24:40].reshape(4, 4)
    from ..raster import swizzle_dims, unswizzle_plane

    _wt, _ht, size = swizzle_dims(width, height)  # swizzled id space

    # one scan step per chunk: the HLO stays O(1) in scene size (a
    # 24-chunk 100M-point frame unrolled exceeds what the compile
    # service accepts).  Each chunk's stream is sorted as SORT_ROWS
    # independent rows — XLA's batched sort at row width n is far
    # cheaper than one flat sort (0.87 ms at 256x16K vs 6.4 ms at 4.2M,
    # experiments/r3_sort_menu.py) and the swizzled tile space keeps
    # per-row merge windows compact (experiments/r3_windows.py).
    # num_keys follows pallas_merge.SORT_KEYS: nk3 rows make every run's
    # head its exact u64 min, so the throughput-bound matscatter merge
    # kernel runs suffix-free (the +0.56 ms sort buys back ~2x that in
    # kernel time on window-heavy views, experiments/r3_matscatter.py)
    from ..pallas_merge import SORT_KEYS

    # live-chunk compaction: a chunk with NO visible batch skips its
    # whole decode+project+sort via lax.cond (close-up views cull most
    # of a large scene, and Morton order keeps the visible batches in
    # few contiguous chunks — the reference analogue is simply not
    # launching blocks for culled batches).  Skipped steps emit
    # sentinel rows (pid = size), which the merge table treats as
    # empty; the image is bit-identical because culled batches
    # contributed nothing anyway (lod_n == 0 masks all their points).
    chunk_live = (
        lod_n[: nchunks * CHUNK].reshape(nchunks, CHUNK) > 0
    ).any(axis=1)
    live_order = jnp.argsort(~chunk_live, stable=True).astype(jnp.int32)
    n_live_chunks = chunk_live.sum().astype(jnp.int32)

    # while_loop with a DYNAMIC trip count (one body instance — a
    # cond-in-scan variant doubled the compiled body and blew the
    # remote-compile budget at 96 chunks); rows of never-visited
    # chunks keep their sentinel init (pid = size), which the merge
    # table treats as empty
    nseg = CHUNK * 1024 * points // SORT_ROWS
    sps0 = jnp.full((nchunks * SORT_ROWS, nseg), jnp.uint32(size))
    sds0 = jnp.zeros((nchunks * SORT_ROWS, nseg), jnp.uint32)
    sys0 = jnp.zeros((nchunks * SORT_ROWS, nseg), jnp.uint32)

    def chunk_cond(st):
        return st[0] < n_live_chunks

    def chunk_body(st):
        g, sps, sds, sys_ = st
        c = live_order[g]
        pid_c, dep_c, pay_c = render_chunk_native(
            dev, c * CHUNK, transform, lod_n, scale, offset_rel,
            width, height, mode, use_pallas, points, fmt, tb,
            color_fmt=color_fmt,
        )
        sp, sd, sy = jax.lax.sort(
            [pid_c.reshape(SORT_ROWS, nseg).astype(jnp.uint32),
             dep_c.reshape(SORT_ROWS, nseg), pay_c.reshape(SORT_ROWS, nseg)],
            num_keys=SORT_KEYS if use_pallas else 1,
            is_stable=False, dimension=1,
        )
        row0 = g * SORT_ROWS
        return (g + 1,
                jax.lax.dynamic_update_slice(sps, sp, (row0, 0)),
                jax.lax.dynamic_update_slice(sds, sd, (row0, 0)),
                jax.lax.dynamic_update_slice(sys_, sy, (row0, 0)))

    _g, sps, sds, sys_ = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), sps0, sds0, sys0)
    )
    if mode == "colorize_overdraw":
        # per-pixel point counts -> 5-bucket spectral heatmap (debug mode;
        # reference: compute_loop_las_hqs/resolve.cs:54-103).  Counts use
        # the XLA scatter-add: a debug frame may cost ~20 ms, acceptable.
        counts = jnp.zeros((size,), jnp.uint32)
        counts = counts.at[sps.reshape(-1)].add(jnp.uint32(1), mode="drop")
        counts = unswizzle_plane(counts, width, height)
        color = jnp.full((width * height,), 0x00BA832B, jnp.uint32)
        for thresh, c in ((10, 0x00A4DDAB), (250, 0x00BFFFFF),
                          (1000, 0x0061AEFD), (4000, 0x001C19D7)):
            color = jnp.where(counts >= thresh, jnp.uint32(c), color)
        img = jnp.where(
            counts > 0, color, jnp.uint32(0x00443322)
        ).reshape(height, width)
        return None, counts, img
    if use_pallas:
        from ..pallas_merge import dense_from_sorted_rows

        fb_d, fb_p = dense_from_sorted_rows(
            sps.reshape(-1, nseg), sds.reshape(-1, nseg),
            sys_.reshape(-1, nseg), size, need_depth, tile_cols=_wt,
            fully_sorted=SORT_KEYS == 3,
            pay_bits=24,  # BC1 payload is R|G<<8|B<<16
        )
    else:
        from ..raster import sorted_resolve_u64_min

        fb_d, fb_p = sorted_resolve_u64_min(
            sps.reshape(-1), sds.reshape(-1), sys_.reshape(-1),
            size, need_depth, use_pallas=False,
        )
    # back to linear pixel ids for all external consumers
    fb_p = unswizzle_plane(fb_p, width, height)
    if fb_d is not None:
        fb_d = unswizzle_plane(fb_d, width, height)
    if mode == "colorize_chunks":
        img = jnp.where(
            fb_p != EMPTY, fb_p * jnp.uint32(1234567), jnp.uint32(0x00443322)
        ).reshape(height, width)
    elif mode == "show_num_points":
        shade = jnp.clip(
            (fb_p.astype(jnp.float32) / 64.0) * 255.0, 0, 255
        ).astype(jnp.uint32)
        gray = shade | (shade << 8) | (shade << 16)
        img = jnp.where(fb_p != EMPTY, gray, jnp.uint32(0x00443322)).reshape(
            height, width
        )
    else:
        img = jnp.where(fb_p != EMPTY, fb_p, jnp.uint32(0x00443322)).reshape(
            height, width
        )
    return fb_d, fb_p, img


class HuffmanTpu(HuffmanMemIter):
    """Flagship native-format method (Pallas decode path)."""

    def __init__(self, renderer, tpc):
        self.name = "huffman_tpu"
        self.description = "fused tbatch Pallas decode + rasterize"
        self.group = "huffman"
        self.las = tpc
        self.renderer = renderer

    def render(self, renderer):
        las = self.las
        las.process(renderer)
        W, H = renderer.width, renderer.height
        fb_d = jnp.full((W * H,), EMPTY, jnp.uint32)
        fb_p = jnp.full((W * H,), EMPTY, jnp.uint32)
        B = las.num_batches_loaded
        if B == 0:
            return resolve(fb_p, W, H)

        mode = (
            "colorize_chunks"
            if Debug.colorize_chunks
            else "show_num_points" if Debug.show_num_points
            else "colorize_overdraw" if Debug.colorize_overdraw
            else "color"
        )
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
        # LOD bucket: decode only ceil(max_lod/16)*16 points per chain
        # (static-shape variant of render.cu:428's early loop exit);
        # shrinks decode AND sort/scatter volume when zoomed out
        _, lod_full = self.frame_setup(renderer)
        max_lod = int(lod_full.max()) if B else POINTS_PER_THREAD
        points = max(16, -(-max_lod // 16) * 16)
        need_depth = bool(getattr(renderer, "capture_depth", False)) or Debug.edl
        fmt = "fixed" if getattr(las, "version", 1) == 2 else "tbatch"
        # per-batch folded translations: the reference's f64 close-up
        # precision (render.cu:459-461), O(batches) host f64 per frame
        from ..camera import batch_translations

        tb = batch_translations(
            (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
            las.scale, las.offset, las.las_min,
        )
        # ONE host->device transfer per frame: frame params and the
        # per-batch folded translations ride a single packed array and
        # split on device (each dispatch through the axon tunnel pays
        # per-transfer latency; the reference's analogue is one
        # ChangingRenderData upload, huffman_mem_iter_cuda.h:160-183)
        packed = jnp.asarray(np.concatenate(
            [fp, np.asarray(tb, np.float32).ravel()]))
        # nchunks is the SCENE capacity, not the loaded count: chunks
        # beyond num_batches_loaded skip via the live-chunk cond (their
        # lod_n is 0), so streaming loads render without recompiling
        # the frame for every upload step
        fb_d, fb_p, img = render_frame_native(
            las.dev, packed[:40], scale, offset_rel, W, H, mode,
            (las.num_batches + CHUNK - 1) // CHUNK,
            jax.default_backend() == "tpu",
            Debug.frustum_culling_enabled and Debug.update_frustum,
            points, need_depth, fmt, packed[40:].reshape(-1, 4),
            color_fmt=getattr(las, "color_fmt", "bc1"),
        )
        renderer.last_fb = (fb_d, fb_p)
        if Debug.show_bounding_box:
            from ..overlay import draw_bounding_boxes

            img = draw_bounding_boxes(
                img, las.dev["bbox_min"][:], las.dev["bbox_max"][:],
                jnp.asarray(fp[24:40].reshape(4, 4)), W, H,
            )
        return img
