"""Round-3 phase breakdown of the flagship frame on the bench scene.

Slope-times (k-chain method): decode kernel alone, decode+project+
collapse, +sort, and the merge kernel on the frame's real sorted
stream.  Establishes where the 13.3 ms at 4.2M points actually goes
before the round-3 resolve-wall attack.
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
    HuffmanTpu, render_chunk_native, CHUNK,
)
from pcrhpg24_tpu.render.pallas_decode_fixed import decode_fixed_batches
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_nk1_multi
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                        target=(1000.0, 1000.0, 100.0)))
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
SIZE = W * H
dev = las.dev
wvp_d = jnp.asarray(wvp)
lod_d = jnp.asarray(lod_full)


def slope(fn, label, k1=1, k2=6):
    """fn(tok, k) -> scalar; prints (t(k2)-t(k1))/(k2-k1)."""
    ts = {}
    for k in (k1, k2):
        float(fn(jnp.uint32(0), k))  # compile+warm
        t0 = time.perf_counter()
        float(fn(jnp.uint32(0), k))
        ts[k] = time.perf_counter() - t0
    ms = (ts[k2] - ts[k1]) / (k2 - k1) * 1e3
    print(f"{label:28s} {ms:8.2f} ms", flush=True)
    return ms


# ---- phase 1: decode kernel only ----
@functools.partial(jax.jit, static_argnames=("k",))
def f_decode(tok, k):
    acc = jnp.uint32(0)
    for _ in range(k):
        coords = decode_fixed_batches(
            dev["widths"], dev["streams"],
            dev["ptrs"] + tok.astype(jnp.int32) * 0, dev["starts"])
        acc += coords[0, 0, 0, 0, 0].astype(jnp.uint32)
        tok = acc
    return acc


# ---- phase 2: decode + project + BC1 + collapse (render_chunk) ----
@functools.partial(jax.jit, static_argnames=("k",))
def f_chunk(tok, k):
    acc = jnp.uint32(0)
    for _ in range(k):
        pid, dep, pay = render_chunk_native(
            dev, 0, wvp_d + tok.astype(jnp.float32) * 0, lod_d, scale,
            offset_rel, W, H, "color", fmt="fixed", tb=tb)
        acc += pid[0].astype(jnp.uint32) + dep[0] + pay[0]
        tok = acc
    return acc


# ---- phase 3: + sort ----
@functools.partial(jax.jit, static_argnames=("k",))
def f_sorted(tok, k):
    acc = jnp.uint32(0)
    for _ in range(k):
        pid, dep, pay = render_chunk_native(
            dev, 0, wvp_d + tok.astype(jnp.float32) * 0, lod_d, scale,
            offset_rel, W, H, "color", fmt="fixed", tb=tb)
        sp, sd, sy = jax.lax.sort(
            [pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)
        acc += sp[0] + sd[0] + sy[0]
        tok = acc
    return acc


# ---- phase 4: merge kernel on the frame's real sorted stream ----
@jax.jit
def produce_stream(wvp_in):
    pid, dep, pay = render_chunk_native(
        dev, 0, wvp_in, lod_d, scale, offset_rel, W, H, "color",
        fmt="fixed", tb=tb)
    return jax.lax.sort(
        [pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)


spid, sdep, spay = jax.block_until_ready(produce_stream(wvp_d))
nreal = int((np.asarray(spid) < SIZE).sum())
npts = int(pid.shape[0])
print(f"points={npts} real_entries={nreal} "
      f"({100.0*nreal/npts:.1f}%)", flush=True)

# run-length stats of the sorted stream (how long are pid runs?)
sp_np = np.asarray(spid)
real = sp_np[sp_np < SIZE]
if real.size:
    bounds = np.flatnonzero(np.diff(real)) + 1
    runs = np.diff(np.concatenate([[0], bounds, [real.size]]))
    print(f"covered_pixels={runs.size} run_len p50={np.percentile(runs,50):.0f}"
          f" p90={np.percentile(runs,90):.0f} p99={np.percentile(runs,99):.0f}"
          f" max={runs.max()}", flush=True)


@functools.partial(jax.jit, static_argnames=("k",))
def f_merge(tok, k):
    acc = jnp.uint32(0)
    sp = spid + tok * 0
    for _ in range(k):
        fd, fp = dense_from_sorted_nk1_multi(
            [(sp, sdep, spay)], SIZE, need_depth=True)
        acc += fp[0] + fd[0]
        sp = spid + (acc & jnp.uint32(0))
    return acc


d_ms = slope(f_decode, "decode kernel")
c_ms = slope(f_chunk, "decode+project+collapse")
s_ms = slope(f_sorted, "  +sort nk1")
m_ms = slope(f_merge, "merge kernel")
print(f"\nproject+collapse = {c_ms - d_ms:.2f} ms   sort = {s_ms - c_ms:.2f} ms"
      f"\nsum(parts) = {s_ms + m_ms:.2f} ms", flush=True)
