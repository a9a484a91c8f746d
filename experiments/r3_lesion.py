"""Lesion-based phase attribution of the flagship frame (device traces).

Each chain is the REAL pipeline truncated after a phase, with the
truncated outputs consumed via strided XOR samples (defeats XLA's
sort-slice and slice-DCE rewrites: a [0,0] probe let XLA replace a
full sort with an argmin and zero out a phase entirely —
experiments/r3_resolve_menu2.py's 0.00 ms sort reading).

Every stage's inputs are chained through a data-dependent token so no
stage is loop-invariant (the bench chain itself lets XLA hoist the
decode, whose inputs don't depend on the camera — its headline
excludes ~0.9 ms of decode; numbers here are per honest frame).
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
    HuffmanTpu, SORT_ROWS,
)
from pcrhpg24_tpu.render.pallas_decode_fixed import decode_fixed_batches
from pcrhpg24_tpu.render.pallas_project import project_batches
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import swizzle_dims
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
dev = las.dev
t = jnp.asarray(wvp).astype(jnp.float32)
frame12 = jnp.concatenate([t[0, :3], t[1, :3], t[3, :3], scale[:3]])
colors_k = dev["colors_k"]


def sample(x):
    """Strided XOR-fold: consumes the whole array, resists DCE."""
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
    print(f"{label:40s} {ms:8.2f} ms", flush=True)
    return ms


def dec(tok):
    ptrs = dev["ptrs"] + (tok == jnp.uint32(123456789)).astype(jnp.int32)
    return decode_fixed_batches(dev["widths"], dev["streams"], ptrs,
                                dev["starts"])


def proj(tok):
    coords = dec(tok)
    pid, dep, pay = project_batches(
        coords, colors_k, dev["anchor"], tb, lod_d, frame12, W, H,
        points=64)
    return pid, dep, pay


NK = int(__import__("os").environ.get("NK", "3"))


def sort_rows(tok):
    pid, dep, pay = proj(tok)
    n = pid.size // SORT_ROWS
    return jax.lax.sort(
        [pid.reshape(SORT_ROWS, n), dep.reshape(SORT_ROWS, n),
         pay.reshape(SORT_ROWS, n)],
        num_keys=NK, is_stable=False, dimension=1)


def table(tok):
    sp, sd, sy = sort_rows(tok)
    cumwin, wrowtile, _nr, _np2 = pm.build_rows_window_table(
        sp, SIZE, wide=pm.ILP_WIDE, clip=pm.CLIP_TILES, tile_cols=wt_cols)
    return sp, sd, sy, cumwin, wrowtile


def full(tok):
    sp, sd, sy = sort_rows(tok)
    fd, fp = pm.dense_from_sorted_rows(sp, sd, sy, SIZE, need_depth=False,
                                       tile_cols=wt_cols,
                                       fully_sorted=(NK == 3))
    return fp


t1 = measure(lambda tok: sample(dec(tok)), "1 decode")
t2 = measure(lambda tok: jnp.bitwise_xor.reduce(
    jnp.stack([sample(a) for a in proj(tok)])), "2 +project")
t3 = measure(lambda tok: jnp.bitwise_xor.reduce(
    jnp.stack([sample(a) for a in sort_rows(tok)])), "3 +sort rows")
t4 = measure(lambda tok: jnp.bitwise_xor.reduce(
    jnp.stack([sample(a) for a in table(tok)])), "4 +table build")
t5 = measure(lambda tok: sample(full(tok)), "5 +merge (full resolve)")
print(f"\ndecode={t1:.2f} project={t2-t1:.2f} sort={t3-t2:.2f} "
      f"table={t4-t3:.2f} kernel={t5-t4:.2f} total={t5:.2f}")
