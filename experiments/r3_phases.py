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
    ptrs = dev["ptrs"]
    for _ in range(k):
        coords = decode_fixed_batches(
            dev["widths"], dev["streams"], ptrs, dev["starts"])
        probe = coords[0, 0, 0, 0, 0].astype(jnp.uint32)
        acc += probe
        # un-foldable chain: XLA cannot prove probe != magic
        ptrs = dev["ptrs"] + jnp.where(
            probe == jnp.uint32(123456789), 1, 0).astype(jnp.int32)
    return acc


# ---- phase 2: decode + project + BC1 + collapse (render_chunk) ----
@functools.partial(jax.jit, static_argnames=("k",))
def f_chunk(tok, k):
    acc = jnp.uint32(0)
    w = wvp_d
    for _ in range(k):
        pid, dep, pay = render_chunk_native(
            dev, 0, w, lod_d, scale,
            offset_rel, W, H, "color", fmt="fixed", tb=tb)
        probe = pid[0].astype(jnp.uint32) + dep[0] + pay[0]
        acc += probe
        w = wvp_d + jnp.where(
            probe == jnp.uint32(123456789), 1.0, 0.0).astype(jnp.float32)
    return acc


# ---- phase 3: + sort ----
@functools.partial(jax.jit, static_argnames=("k",))
def f_sorted(tok, k):
    acc = jnp.uint32(0)
    w = wvp_d
    for _ in range(k):
        pid, dep, pay = render_chunk_native(
            dev, 0, w, lod_d, scale,
            offset_rel, W, H, "color", fmt="fixed", tb=tb)
        sp, sd, sy = jax.lax.sort(
            [pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)
        probe = sp[0] + sd[0] + sy[0]
        acc += probe
        w = wvp_d + jnp.where(
            probe == jnp.uint32(123456789), 1.0, 0.0).astype(jnp.float32)
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
npts = int(spid.shape[0])
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
def f_merge(tok, k, ilp=True):
    acc = jnp.uint32(0)
    sp = spid
    for _ in range(k):
        fd, fp = dense_from_sorted_nk1_multi(
            [(sp, sdep, spay)], SIZE, need_depth=True, ilp=ilp)
        probe = fp[0] + fd[0]
        acc += probe
        sp = spid + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(
            jnp.uint32)
    return acc


d_ms = slope(f_decode, "decode kernel")
c_ms = slope(f_chunk, "decode+project+collapse")
s_ms = slope(f_sorted, "  +sort nk1")
m_ms = slope(functools.partial(f_merge, ilp=False), "merge kernel v2")
m2_ms = slope(f_merge, "merge kernel ilp")
print(f"\nproject+collapse = {c_ms - d_ms:.2f} ms   sort = {s_ms - c_ms:.2f} ms"
      f"\nsum(parts) = {s_ms + m_ms:.2f} ms", flush=True)
