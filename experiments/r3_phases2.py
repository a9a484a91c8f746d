"""Round-3 phase breakdown of the CURRENT flagship frame (post a2a70e0).

Pipeline phases on the bench orbit view (4.2M pts, 64 batches):
  1 decode kernel (fbatch Pallas)
  2 + fused project/BC1/collapse (pallas_project)
  3 + SORT_ROWS-segmented nk1 sort
  4 + window-table build (clipped 2D build, as the frame runs it)
  5 + merge kernel (full dense_from_sorted_rows)
  6 whole render_frame_native

Slope method, min over REPS repetitions (the axon tunnel adds >=100 ms
jitter per dispatch; the min of repeated (t(k2)-t(k1))/(k2-k1) slopes
is stable to ~0.1 ms, experiments/NOTES.md round 2).
"""
import sys, pathlib, time, functools, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native, render_frame_native, CHUNK, SORT_ROWS,
)
from pcrhpg24_tpu.render.pallas_decode_fixed import decode_fixed_batches
from pcrhpg24_tpu.render.pallas_merge import (
    CLIP_TILES, build_rows_window_table, dense_from_sorted_rows, _clip_fits,
)
from pcrhpg24_tpu.render.raster import swizzle_dims
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
REPS = 5
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
VIEW = os.environ.get("VIEW", "orbit")
SETTINGS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
r.apply_setting(SETTINGS[VIEW])
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
cam = r.camera
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
nch = (las.num_batches_loaded + CHUNK - 1) // CHUNK
wt_cols, _ht, SIZE = swizzle_dims(W, H)
dev = las.dev
wvp_d = jnp.asarray(wvp)
lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)

fp = np.zeros(40, np.float32)
fp[0:16] = cam.view().astype(np.float32).reshape(-1)
fp[16:22] = cam.proj_params().astype(np.float32)
fp[22] = 1.0
fp[23] = float(las.num_batches_loaded)
fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
fp_d = jnp.asarray(fp)


def slope(fn, label, k1=1, k2=11):
    # tunnel RTT jitter is one-sided (+): min PER k over reps, then slope
    ts = {k1: 1e9, k2: 1e9}
    for k in (k1, k2):
        float(fn(jnp.uint32(0), k))  # compile+warm
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(jnp.uint32(0), k))
            ts[k] = min(ts[k], time.perf_counter() - t0)
    best = (ts[k2] - ts[k1]) / (k2 - k1)
    print(f"{label:34s} {best*1e3:8.2f} ms", flush=True)
    return best * 1e3


def chained(prod):
    """prod(wvp) -> arrays; returns chain fn for slope()."""
    @functools.partial(jax.jit, static_argnames=("k",))
    def f(tok, k):
        acc = jnp.uint32(0)
        w = wvp_d
        for _ in range(k):
            outs = prod(w)
            probe = outs
            acc += probe
            w = wvp_d + jnp.where(
                probe == jnp.uint32(123456789), 1.0, 0.0).astype(jnp.float32)
        return acc
    return f


# ---- 1 decode ----
def p_decode(w):
    coords = decode_fixed_batches(
        dev["widths"], dev["streams"],
        dev["ptrs"] + (w[0, 0] == 12345.0).astype(jnp.int32),
        dev["starts"])
    return coords[0, 0, 0, 0, 0].astype(jnp.uint32)


# ---- 2 + project ----
def p_project(w):
    pid, dep, pay = render_chunk_native(
        dev, 0, w, lod_d, scale, offset_rel, W, H, "color",
        fmt="fixed", tb=tb)
    return pid[0].astype(jnp.uint32) + dep[0] + pay[0]


# ---- 3 + rows sort ----
def rows_sorted(w):
    pid, dep, pay = render_chunk_native(
        dev, 0, w, lod_d, scale, offset_rel, W, H, "color",
        fmt="fixed", tb=tb)
    n = pid.shape[0] // SORT_ROWS
    return jax.lax.sort(
        [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
         dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
        num_keys=1, is_stable=False, dimension=1)


def p_sort(w):
    sp, sd, sy = rows_sorted(w)
    return sp[0, 0] + sd[0, 0] + sy[0, 0]


# ---- 4 + table build (clipped, as the frame picks it) ----
def p_table(w):
    sp, sd, sy = rows_sorted(w)
    cumwin, wrowtile, _nr, _np_ = build_rows_window_table(
        sp, SIZE, wide=2, clip=CLIP_TILES, tile_cols=wt_cols)
    return (cumwin[-1].astype(jnp.uint32) + wrowtile[0].astype(jnp.uint32)
            + sd[0, 0] + sy[0, 0])


# ---- 5 + merge kernel ----
def p_merge(w):
    sp, sd, sy = rows_sorted(w)
    fd, fp2 = dense_from_sorted_rows(sp, sd, sy, SIZE, need_depth=True,
                                     tile_cols=wt_cols)
    return fd[0] + fp2[0]


# ---- 6 whole frame ----
def p_frame(w):
    fpx = fp_d.at[24:40].set(w.reshape(-1))
    _fd, _fp2, img = render_frame_native(
        dev, fpx, scale, offset_rel, tb=tb, width=W, height=H,
        mode="color", nchunks=nch, use_pallas=True, cull=True,
        need_depth=False, fmt="fixed")
    return img[0, 0]


t1 = slope(chained(p_decode), "1 decode")
t2 = slope(chained(p_project), "2 +project/BC1/collapse")
t3 = slope(chained(p_sort), "3 +rows sort")
t4 = slope(chained(p_table), "4 +window table build")
t5 = slope(chained(p_merge), "5 +merge kernel")
t6 = slope(chained(p_frame), "6 whole frame")
print(f"\nproject={t2-t1:.2f} sort={t3-t2:.2f} table={t4-t3:.2f} "
      f"merge={t5-t4:.2f} frame_overhead={t6-t5:.2f}")
