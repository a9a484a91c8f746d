"""24+8-bit f32 planes vs 8-bit bf16 byte planes in the matscatter kernel.

The kernel floor is per-window VPU A-build work: 8 broadcast+mul vreg
ops per er per PLANE (r3_i8dot lesions; dots are nearly free — no-dot
lesion saved only 0.05 ms).  Splitting each 32-bit word as lo24|hi8
instead of 4 bytes drops the flagship plane count 7 -> 3 (d24,
d8+marker, p24): a 0/1 f32 mask times a value < 2**24 is exact, and
head-masking guarantees a single nonzero contributor per pixel per
window, so the f32 MXU accumulation stays bit-exact.

Times dense_from_sorted_rows on the production nk3 streams with
plane24 False/True and asserts both are bit-exact vs the XLA scatter
path.

VERDICT (orbit, device traces, min-of-10): RULED OUT, reverted.
    byte planes  pay_bits=24: 2.263 ms   pay_bits=0: 2.125 ms
    24+8 planes  pay_bits=24: 3.574 ms   pay_bits=0: 3.557 ms
Two findings: (1) the default TPU f32 dot is ONE lossy bf16 pass —
plane24 needed Precision.HIGHEST (6-pass) for bit-exactness (interpret
mode passed, device failed silently without it); (2) each extra MXU
pass costs ~0.26 ms/frame at this window count, so the 6-pass dots
swamp the 24-mul A-build saving.  8-bit byte planes ARE the bf16-exact
value decomposition; the kernel variant was reverted
(pallas_merge._merge_matscatter_kernel keeps bf16 byte planes).  This
script is kept as the record; it no longer runs against the reverted
kernel (dense_from_sorted_rows has no plane24 arg).
"""
raise SystemExit("plane24 kernel variant was reverted; see docstring")
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
gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))

for p24 in (False, True):
    for bits in (24, 0):
        fn = lambda a=p24, b=bits: dense_from_sorted_rows(
            sp, sd, sy, SIZE, True, tile_cols=wt_cols, fully_sorted=True,
            pay_bits=b, plane24=a)
        d, p = jax.block_until_ready(fn())
        assert bool(jnp.all(d == gt_d)), (p24, bits, "depth mismatch")
        if bits == 24:
            assert bool(jnp.all(p == gt_p)), (p24, bits, "pay mismatch")
        ms = device_ms(fn, reps=K) / K
        print(f"{VIEW}: plane24={int(p24)} pay_bits={bits:2d}: "
              f"{ms:6.3f} ms (bit-exact vs XLA)", flush=True)
