"""XLA TPU sort cost vs shape on the real bench stream.

If sort over (rows, n) vectorizes the comparators across rows, the
global 4.2M nk1 sort (6.8 ms, 52% of the frame) can be replaced by
per-batch sorts + multi-stream merge.  Measures 3-operand nk1 sorts of
the same 4.2M entries partitioned into rows.
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

pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale, offset_rel,
    W, H, "color", fmt="fixed", tb=tb)
pid = jax.block_until_ready(pid.astype(jnp.uint32))
dep = jax.block_until_ready(dep)
pay = jax.block_until_ready(pay)
N = pid.shape[0]
print(f"N={N}", flush=True)


def slope_sort(rows, k2=6):
    n = N // rows

    @functools.partial(jax.jit, static_argnames=("k",))
    def f(a0, k):
        acc = jnp.uint32(0)
        a = a0
        for _ in range(k):
            sp, sd, sy = jax.lax.sort(
                [a.reshape(rows, n), dep.reshape(rows, n),
                 pay.reshape(rows, n)],
                num_keys=1, is_stable=False, dimension=1)
            probe = sp[0, 0] + sd[0, 0] + sy[0, 0]
            acc += probe
            a = a0 + jnp.where(
                probe == jnp.uint32(123456789), 1, 0).astype(jnp.uint32)
        return acc

    ts = {}
    for k in (1, k2):
        float(f(pid, k))
        t0 = time.perf_counter()
        float(f(pid, k))
        ts[k] = time.perf_counter() - t0
    ms = (ts[k2] - ts[1]) / (k2 - 1) * 1e3
    print(f"sort ({rows:5d} x {n:8d}) nk1x3: {ms:8.2f} ms", flush=True)
    return ms


for rows in (1, 2, 4, 8, 16, 64, 256, 1024):
    slope_sort(rows)
