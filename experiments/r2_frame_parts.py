"""Frame stage attribution for the v2 pipeline on the bench scene."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native, render_frame_native, CHUNK)
from pcrhpg24_tpu.render.pallas_decode_fixed import decode_fixed_batches
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_nk1
from pcrhpg24_tpu.render.methods.huffman_mem_iter import _slice_rows

W, H = 1920, 1080
Debug.lod = 1.0
import os
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
assert las.version == 2
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
lod_dev = jnp.asarray(lod_full)
t = jnp.asarray(wvp)
SIZE = W * H
dev = las.dev

def slope(fn):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(t, k):
        acc = jnp.uint32(0)
        for _ in range(k):
            outs = fn(t)
            probe = outs[0].reshape(-1)[0].astype(jnp.uint32)
            bump = jnp.where(probe == jnp.uint32(123456789), 1.0, 0.0)
            t = t + bump.astype(jnp.float32)
            acc += probe
        return acc
    ts = {}
    for k in (1, 4):
        float(chain(t, k=k))
        t0 = time.perf_counter(); float(chain(t, k=k)); ts[k] = time.perf_counter() - t0
    return (ts[4] - ts[1]) / 3 * 1e3

def decode_only(t):
    c = decode_fixed_batches(dev["widths"], dev["streams"],
                             dev["ptrs"], dev["starts"])
    return (c.reshape(-1)[:8].astype(jnp.uint32) + t[0, 0].astype(jnp.uint32),)

def chunk_only(t):
    pid, dep, pay = render_chunk_native(dev, 0, t, lod_dev, scale, offset_rel, W, H, "color", fmt="fixed")
    return (pid,)

def chunk_sort(t):
    pid, dep, pay = render_chunk_native(dev, 0, t, lod_dev, scale, offset_rel, W, H, "color", fmt="fixed")
    s = jax.lax.sort([pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)
    return (s[0],)

def full(t):
    pid, dep, pay = render_chunk_native(dev, 0, t, lod_dev, scale, offset_rel, W, H, "color", fmt="fixed")
    spid, sdep, spay = jax.lax.sort([pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)
    _d, p = dense_from_sorted_nk1(spid, sdep, spay, SIZE, False)
    return (p,)

# survivor count after run-collapse
pid, dep, pay = render_chunk_native(dev, 0, t, lod_dev, scale, offset_rel, W, H, "color", fmt="fixed")
real = int((np.asarray(pid) < SIZE).sum())
print(f"entries after collapse: {real} / {pid.shape[0]} ({real/pid.shape[0]:.2%})", flush=True)

print(f"decode only      : {slope(decode_only):7.2f} ms", flush=True)
print(f"decode+proj+clps : {slope(chunk_only):7.2f} ms", flush=True)
print(f"  + nk1 sort     : {slope(chunk_sort):7.2f} ms", flush=True)
print(f"  + merge (full) : {slope(full):7.2f} ms", flush=True)

from pcrhpg24_tpu.render.methods.huffman_tpu import render_frame_native
fp = np.zeros(40, np.float32)
cam = r.camera
fp[0:16] = cam.view().astype(np.float32).reshape(-1)
fp[16:22] = cam.proj_params().astype(np.float32)
fp[22] = 1.0
fp[23] = float(las.num_batches_loaded)
fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
fpd = jnp.asarray(fp)
nch = (las.num_batches_loaded + CHUNK - 1) // CHUNK

def frame(t):
    _d, _p, img = render_frame_native(
        dev, fpd + 0 * t[0, 0], scale, offset_rel, width=W, height=H,
        mode="color", nchunks=nch, use_pallas=True, cull=True,
        need_depth=False, fmt="fixed")
    return (img.reshape(-1),)

print(f"render_frame_native: {slope(frame):7.2f} ms", flush=True)

# exactness of the full nk1 resolve on REAL TPU vs the XLA dedup path
from pcrhpg24_tpu.render.raster import sorted_resolve_u64_min
fbd_ref, fbp_ref = sorted_resolve_u64_min(pid, dep, pay, SIZE, True, use_pallas=False)
spid, sdep, spay = jax.lax.sort([pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False)
fbd, fbp = dense_from_sorted_nk1(spid, sdep, spay, SIZE, True)
ok_p = bool((np.asarray(fbp) == np.asarray(fbp_ref)).all())
ok_d = bool((np.asarray(fbd) == np.asarray(fbd_ref)).all())
print(f"TPU nk1 resolve exact: payload={ok_p} depth={ok_d}", flush=True)
