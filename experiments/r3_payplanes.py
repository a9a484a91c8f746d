"""Payload byte-plane reduction in the matscatter merge kernel.

The kernel's measured floor is per-window VPU A-build work: 8
broadcast+mul vreg ops per er per PLANE (r3_i8dot lesions).  The
flagship BC1 payload is R|G<<8|B<<16 — only 24 live bits — so plane 7
(payload byte3) scatters a constant 0x80 bias byte; the HQS prepass
discards the payload plane entirely.  pay_bits drops those planes:
pay_bits=24 -> 7 planes (-12.5%% A-build), pay_bits=0 -> 4 planes
(-50%%).

Times dense_from_sorted_rows on the production nk3 orbit streams at
pay_bits 32/24/0 and asserts 24 is bit-exact vs the XLA scatter path.
    python experiments/r3_payplanes.py            # orbit
    VIEW=closeup python experiments/r3_payplanes.py
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
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows
from pcrhpg24_tpu.render.raster import swizzle_dims, sorted_resolve_u64_min
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 10
VIEW = os.environ.get("VIEW", "orbit")
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
VIEWS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
r.apply_setting(VIEWS[VIEW])
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
    num_keys=3, is_stable=False, dimension=1))
assert int(jnp.max(jnp.where(pid.astype(jnp.uint32) < SIZE, pay, 0))) < (
    1 << 24), "BC1 payload exceeds 24 bits?"
gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))

for bits in (32, 24, 0):
    fn = lambda b=bits: dense_from_sorted_rows(
        sp, sd, sy, SIZE, True, tile_cols=wt_cols, fully_sorted=True,
        pay_bits=b)
    d, p = jax.block_until_ready(fn())
    ms = device_ms(fn, reps=K) / K
    if bits == 24:
        np.testing.assert_array_equal(np.asarray(p), np.asarray(gt_p))
    if bits:
        np.testing.assert_array_equal(np.asarray(d), np.asarray(gt_d))
    else:
        # pay_bits=0 contract: depth plane still exact
        np.testing.assert_array_equal(np.asarray(d), np.asarray(gt_d))
    print(f"{VIEW} pay_bits={bits:2d}: {ms:.3f} ms", flush=True)
