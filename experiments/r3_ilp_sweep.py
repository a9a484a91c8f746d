"""ILP_WIDE / RING sweep of the production merge kernel.

The nk1 merge kernel is latency-bound: its per-window compute
(~300 vreg ops) would take ~1.2 ms at VPU throughput but measures
3.2 ms — the 10-probe search and the suffix-min are serial dependency
chains.  ILP_WIDE=2 already interleaves two windows; this sweeps wider
interleaves and deeper DMA rings on the REAL kernel + table-build path
(pm._dense_rows_group), exactness-gated per config against the XLA
scatter resolve.
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native, SORT_ROWS,
)
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import swizzle_dims, sorted_resolve_u64_min
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 10
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
offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
cam = r.camera
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
wt_cols, _ht, SIZE = swizzle_dims(W, H)
lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)

pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), lod_d, scale, offr, W, H, "color",
    fmt="fixed", tb=tb)
n = pid.shape[0] // SORT_ROWS
sp, sd, sy = jax.block_until_ready(jax.lax.sort(
    [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
     dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
    num_keys=1, is_stable=False, dimension=1))
_gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, False, use_pallas=False))
gt_p = np.asarray(gt_p)


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


FS = __import__("os").environ.get("FS", "0") == "1"  # fully_sorted kernel
if FS:
    sp, sd, sy = jax.block_until_ready(jax.lax.sort(
        [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
         dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
        num_keys=3, is_stable=False, dimension=1))


def run(wide, ring):
    pm.ILP_WIDE, pm.RING = wide, ring

    def resolve(spv, sdv, syv):
        fast_ok = None if FS else pm._runs_bounded(spv, SIZE)
        _d, p = pm._dense_rows_group(
            spv, sdv, syv, SIZE, False, True, fast_ok, pm.CLIP_TILES,
            wt_cols, fully_sorted=FS)
        return p

    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            sdv = sd ^ (acc & jnp.uint32(1))
            acc = acc ^ sample(resolve(sp, sdv, sy))
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    got = np.asarray(jax.jit(resolve)(sp, sd, sy))
    ok = np.array_equal(got, gt_p)
    print(f"wide={wide} ring={ring}  {ms:7.2f} ms  exact={ok}", flush=True)
    return ms, ok


run(2, 6)  # baseline (production config)
run(3, 6)
run(4, 6)
run(4, 8)
run(6, 8)
run(2, 8)
