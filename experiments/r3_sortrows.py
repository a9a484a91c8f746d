"""SORT_ROWS sweep: batched-sort width vs window-count tradeoff.

XLA's batched sort gets superlinearly cheaper with narrower rows
(r3_sort_menu: 0.87 ms at 256x16K vs 6.4 flat), while window count
grows with the number of row streams (each row adds its own
(row, tile) perimeter pairs).  Sweep the full frame at S=128/256/512
on all three bench views; exactness-gated against the XLA scatter.
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
    HuffmanTpu, render_chunk_native,
)
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import (
    swizzle_dims, sorted_resolve_u64_min, unswizzle_plane,
)
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 10
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
SETTINGS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
wt_cols, _ht, SIZE = swizzle_dims(W, H)


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


for view, setting in SETTINGS.items():
    r.apply_setting(setting)
    m = HuffmanTpu(r, las)
    m.update(r)
    las.wait_loaded(r)
    r.controls_update()
    wvp, lod_full = m.frame_setup(r)
    scale = jnp.asarray(las.scale, jnp.float32)
    offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
    cam = r.camera
    tb = jnp.asarray(batch_translations(
        (cam.proj() @ cam.view()),
        las.anchor_i[: las.dev["anchor"].shape[0]],
        las.scale, las.offset, las.las_min))
    lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)
    pid, dep, pay = jax.block_until_ready(render_chunk_native(
        las.dev, 0, jnp.asarray(wvp), lod_d, scale, offr, W, H, "color",
        fmt="fixed", tb=tb))
    gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
        pid.astype(jnp.uint32), dep, pay, SIZE, True, use_pallas=False))
    gt_d, gt_p = np.asarray(gt_d), np.asarray(gt_p)

    for S in (128, 256, 512):
        n = pid.shape[0] // S

        def stage(tok, S=S, n=n):
            p = pid ^ (tok & jnp.uint32(0xFFFF0000))  # varies, high bits 0
            sp, sd, sy = jax.lax.sort(
                [p.reshape(S, n).astype(jnp.uint32),
                 dep.reshape(S, n), pay.reshape(S, n)],
                num_keys=1, is_stable=False, dimension=1)
            fd, fp = pm.dense_from_sorted_rows(
                sp, sd, sy, SIZE, need_depth=True, tile_cols=wt_cols)
            return sample(fd) ^ sample(fp)

        @jax.jit
        def chain(stage=stage):
            acc = jnp.uint32(0)
            for _ in range(K):
                acc = acc ^ (stage(acc) & jnp.uint32(0xFFFF))
            return acc

        jax.block_until_ready(chain())
        ms = device_ms(chain, key="jit_chain") / K

        # exactness + window count
        sp, sd, sy = jax.lax.sort(
            [pid.reshape(S, n).astype(jnp.uint32), dep.reshape(S, n),
             pay.reshape(S, n)], num_keys=1, is_stable=False, dimension=1)
        fd, fp = pm.dense_from_sorted_rows(sp, sd, sy, SIZE,
                                           need_depth=True,
                                           tile_cols=wt_cols)
        ok = (np.array_equal(np.asarray(fd), gt_d)
              and np.array_equal(np.asarray(fp), gt_p))
        cw_, _, _, _ = pm.build_rows_window_table(
            sp, SIZE, wide=pm.ILP_WIDE, clip=pm.CLIP_TILES,
            tile_cols=wt_cols)
        print(f"{view:9s} S={S:4d} sort+resolve {ms:7.2f} ms  "
              f"windows={int(np.asarray(cw_)[-1]):6d} "
              f"[{'OK' if ok else 'FAIL'}]", flush=True)
