"""XLA-side resolve-phase candidates, device-trace timed, honest probes.

  STAGE=sort   3-op nk1 sort vs 2-op+gathers (strided-XOR consumption)
  STAGE=table  current bf16 one-hot histogram vs int8 one-hots
  STAGE=views  closeup/oblique: which lax.cond fallbacks fire + stream stats
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
from pcrhpg24_tpu.render.raster import swizzle_dims
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 10
STAGE = os.environ.get("STAGE", "sort")
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


def stream_for(view):
    r.apply_setting(SETTINGS[view])
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
    pid, dep, pay = render_chunk_native(
        las.dev, 0, jnp.asarray(wvp), lod_d, scale, offr, W, H, "color",
        fmt="fixed", tb=tb)
    n = pid.shape[0] // SORT_ROWS
    return (pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
            dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n))


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


def measure(stage_fn, label):
    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            acc = acc ^ stage_fn(acc)
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    print(f"{label:44s} {ms:8.2f} ms", flush=True)
    return ms


p2, d2, y2 = jax.block_until_ready(stream_for("orbit"))
n = p2.shape[1]

if STAGE == "sort":
    def s_3op(tok):
        x = p2 ^ (tok & jnp.uint32(1))
        a, b, c = jax.lax.sort([x, d2, y2], num_keys=1, is_stable=False,
                               dimension=1)
        return sample(a) ^ sample(b) ^ sample(c)

    def s_2op(tok):
        x = p2 ^ (tok & jnp.uint32(1))
        idx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.uint32), x.shape)
        a, i = jax.lax.sort([x, idx], num_keys=1, is_stable=False,
                            dimension=1)
        b = jnp.take_along_axis(d2, i.astype(jnp.int32), axis=1)
        c = jnp.take_along_axis(y2, i.astype(jnp.int32), axis=1)
        return sample(a) ^ sample(b) ^ sample(c)

    # exactness: same pid plane; dep/pay multisets per pixel identical
    sa = jax.lax.sort([p2, d2, y2], num_keys=1, is_stable=False, dimension=1)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), p2.shape)
    a2, i2 = jax.lax.sort([p2, idx], num_keys=1, is_stable=False, dimension=1)
    assert np.array_equal(np.asarray(sa[0]), np.asarray(a2))
    measure(s_3op, "sort 3-op (current)")
    measure(s_2op, "sort 2-op + 2 gathers")

elif STAGE == "table":
    sp, sd, sy = jax.block_until_ready(jax.lax.sort(
        [p2, d2, y2], num_keys=1, is_stable=False, dimension=1))

    def t_cur(tok):
        cumwin, wrowtile, _nr, _np2 = pm.build_rows_window_table(
            sp ^ (tok & jnp.uint32(1)), SIZE, wide=pm.ILP_WIDE,
            clip=pm.CLIP_TILES, tile_cols=wt_cols)
        return sample(cumwin) ^ sample(wrowtile)

    measure(t_cur, "table build bf16 (current)")

elif STAGE == "views":
    for view in ("orbit", "closeup", "oblique"):
        pv, dv, yv = jax.block_until_ready(stream_for(view))
        spv = jax.block_until_ready(jax.lax.sort(
            [pv, dv, yv], num_keys=1, is_stable=False, dimension=1))[0]
        fits = bool(pm._clip_fits(spv, SIZE, pm.CLIP_TILES, wt_cols))
        bounded = bool(pm._runs_bounded(spv, SIZE))
        live = int((np.asarray(spv) < SIZE).sum())
        cw_, _, _, _ = pm.build_rows_window_table(
            spv, SIZE, wide=pm.ILP_WIDE,
            clip=pm.CLIP_TILES if fits else None, tile_cols=wt_cols)
        _bx, _by, cw2, ch2 = pm._tile_boxes(spv, SIZE, wt_cols)
        area = np.asarray(cw2) * np.asarray(ch2)
        sp_np = np.asarray(spv)
        livem = sp_np < SIZE
        runsmax = 0
        for s in range(0, SORT_ROWS, 16):
            row = sp_np[s][livem[s]]
            if row.size:
                b = np.flatnonzero(np.diff(row)) + 1
                runsmax = max(runsmax, int(np.diff(
                    np.concatenate([[0], b, [row.size]])).max()))
        print(f"{view:9s} fits={fits} bounded={bounded} live={live} "
              f"windows={int(np.asarray(cw_)[-1])} "
              f"boxmax={int(area.max())} maxrun(sampled)={runsmax}",
              flush=True)
print("STAGE", STAGE, "done")
