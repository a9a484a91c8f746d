"""Round-3 resolve menu v2: DEVICE-trace timings (utils/devtime.py) of
sort / table / merge candidates on the real bench stream.

STAGE env var selects a candidate group (compile budget per run):
  sort | table | merge | merge2
"""
import sys, pathlib, functools, os
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
STAGE = os.environ.get("STAGE", "merge")
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
p2, d2, y2 = (pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
              dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n))
sp, sd, sy = jax.block_until_ready(jax.lax.sort(
    [p2, d2, y2], num_keys=1, is_stable=False, dimension=1))
gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))
gt_d, gt_p = np.asarray(gt_d), np.asarray(gt_p)


def timeit(prod, label, x0=None, check=None):
    x0 = sp if x0 is None else x0

    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        x = x0
        for _ in range(K):
            out = prod(x)
            acc += out
            x = x0 + jnp.where(out == jnp.uint32(123456789), 1, 0).astype(
                x0.dtype)
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    tag = ""
    if check is not None:
        tag = " [OK]" if check() else " [FAIL]"
    print(f"{label:46s} {ms:8.2f} ms{tag}", flush=True)
    return ms


if STAGE == "sort":
    def s_3op(x):
        a, b, c = jax.lax.sort([x, d2, y2], num_keys=1, is_stable=False,
                               dimension=1)
        return a[0, 0] + b[0, 0] + c[0, 0]

    def s_2op_gather(x):
        idx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.uint32), x.shape)
        a, i = jax.lax.sort([x, idx], num_keys=1, is_stable=False,
                            dimension=1)
        b = jnp.take_along_axis(d2, i.astype(jnp.int32), axis=1)
        c = jnp.take_along_axis(y2, i.astype(jnp.int32), axis=1)
        return a[0, 0] + b[0, 0] + c[0, 0]

    def s_1op(x):  # lower bound: pid alone
        a = jax.lax.sort([x], num_keys=1, is_stable=False, dimension=1)[0]
        return a[0, 0]

    timeit(s_3op, "sort 3-op nk1 (current)", x0=p2)
    timeit(s_2op_gather, "sort 2-op + 2 gathers", x0=p2)
    timeit(s_1op, "sort 1-op (lower bound)", x0=p2)

elif STAGE == "table":
    def t_build(x):
        cumwin, wrowtile, _nr, _np2 = pm.build_rows_window_table(
            x, SIZE, wide=pm.ILP_WIDE, clip=pm.CLIP_TILES,
            tile_cols=wt_cols)
        return cumwin[-1].astype(jnp.uint32) + wrowtile[0].astype(jnp.uint32)

    timeit(t_build, "table build clipped (current)")
    cw_, _, _, _ = pm.build_rows_window_table(
        sp, SIZE, wide=pm.ILP_WIDE, clip=pm.CLIP_TILES, tile_cols=wt_cols)
    print(f"   windows total = {int(np.asarray(cw_)[-1])}")

elif STAGE in ("merge", "merge2"):
    def merge_with(tps, ring, wide, steps):
        def prod(x):
            old = (pm.TPS, pm.TPS_BITS, pm.RING, pm.ILP_WIDE)
            pm.TPS, pm.TPS_BITS = tps, (tps - 1).bit_length()
            pm.RING, pm.ILP_WIDE = ring, wide
            try:
                fd, fp = pm._dense_rows_group(
                    x, sd, sy, SIZE, False, ilp=(wide > 1),
                    fast_ok=(jnp.bool_(True) if steps < 10 else None),
                    clip=pm.CLIP_TILES, tile_cols=wt_cols)
            finally:
                pm.TPS, pm.TPS_BITS, pm.RING, pm.ILP_WIDE = old
            return fd[0] + fp[0]

        def check():
            old = (pm.TPS, pm.TPS_BITS, pm.RING, pm.ILP_WIDE)
            pm.TPS, pm.TPS_BITS = tps, (tps - 1).bit_length()
            pm.RING, pm.ILP_WIDE = ring, wide
            try:
                fd, fp = pm._dense_rows_group(
                    sp, sd, sy, SIZE, False, ilp=(wide > 1),
                    fast_ok=(jnp.bool_(True) if steps < 10 else None),
                    clip=pm.CLIP_TILES, tile_cols=wt_cols)
                return (np.array_equal(np.asarray(fd), gt_d)
                        and np.array_equal(np.asarray(fp), gt_p))
            finally:
                pm.TPS, pm.TPS_BITS, pm.RING, pm.ILP_WIDE = old

        return timeit(prod, f"merge TPS={tps} RING={ring} W={wide} s={steps}",
                      check=check)

    if STAGE == "merge":
        merge_with(4, 6, 2, 6)   # current
        merge_with(4, 8, 3, 6)
        merge_with(8, 8, 2, 6)
    else:
        merge_with(4, 6, 1, 6)
        merge_with(8, 12, 3, 6)
        merge_with(2, 6, 2, 6)
print("STAGE", STAGE, "done")
