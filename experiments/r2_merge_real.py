"""Slope-time the REAL dense_from_sorted_nk1 on the bench stream,
plus TPU exactness vs the XLA dedup path."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu, render_chunk_native
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_nk1
from pcrhpg24_tpu.render.raster import sorted_resolve_u64_min

W, H = 1920, 1080
Debug.lod = 1.0
import os
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
from pcrhpg24_tpu.render.methods.huffman_tpu import CHUNK
nch = (las.num_batches_loaded + CHUNK - 1) // CHUNK
parts = [render_chunk_native(
    las.dev, c * CHUNK, jnp.asarray(wvp), jnp.asarray(lod_full), scale,
    offset_rel, W, H, "color", fmt="fixed") for c in range(nch)]
pid = jnp.concatenate([p for p, _, _ in parts]) if nch > 1 else parts[0][0]
dep = jnp.concatenate([d for _, d, _ in parts]) if nch > 1 else parts[0][1]
pay = jnp.concatenate([y for _, _, y in parts]) if nch > 1 else parts[0][2]
SIZE = W * H
spid, sdep, spay = jax.block_until_ready(jax.lax.sort(
    [pid.astype(jnp.uint32), dep, pay], num_keys=1, is_stable=False))

nreal = int((np.asarray(spid) < SIZE).sum())
print(f"N={pid.shape[0]} real={nreal}", flush=True)

@functools.partial(jax.jit, static_argnames=("k",))
def chain_sort(a, k):
    acc = jnp.uint32(0)
    for _ in range(k):
        s = jax.lax.sort([a, dep, pay], num_keys=1, is_stable=False)
        probe = s[0][0]
        a = a + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(a.dtype)
        acc += probe
    return acc

ts = {}
for k in (1, 4):
    float(chain_sort(pid.astype(jnp.uint32), k=k))
    t0 = time.perf_counter(); float(chain_sort(pid.astype(jnp.uint32), k=k))
    ts[k] = time.perf_counter() - t0
print(f"sort nk1: {(ts[4]-ts[1])/3*1e3:7.2f} ms", flush=True)

@functools.partial(jax.jit, static_argnames=("k",))
def chain(a, k):
    acc = jnp.uint32(0)
    for _ in range(k):
        _d, p = dense_from_sorted_nk1(a, sdep, spay, SIZE, True)
        probe = p[0]
        a = a + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(a.dtype)
        acc += probe
    return acc

ts = {}
for k in (1, 4):
    float(chain(spid, k=k))
    t0 = time.perf_counter(); float(chain(spid, k=k)); ts[k] = time.perf_counter() - t0
print(f"merge nk1: {(ts[4]-ts[1])/3*1e3:7.2f} ms", flush=True)
