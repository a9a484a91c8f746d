"""Sort-key/row-shape menu for the nk3 rows sort (now the largest frame item).

The production frame sorts each chunk's streams as SORT_ROWS=128 rows
with num_keys=3 (1.98 ms at 128x32K, experiments/r3_view_regression.py)
so the matscatter merge kernel can run suffix-free.  Post c-orient the
kernel costs ~0.35 us/window (was ~1.2), which reopens two trades:

  1. nk2 + tie fallback: sort (pid, dep) only and lax.cond to the nk3
     sort iff any adjacent (pid, dep) duplicate with differing payload
     exists (exactness preserved; the cheap path rides scenes without
     exact-depth ties).  Worth (nk3 - nk2) minus a cheap check.
  2. SORT_ROWS re-sweep: narrower rows sort superlinearly cheaper but
     double the (row, tile) window count — the old sweep rejected 256
     when windows cost 1.2 us; at 0.35 us the optimum may have moved.

Measures, on the real orbit/closeup/oblique streams (the
decision-critical trimmed set, see the rates comment below):
  - nk1/nk2/nk3 sort wall-clock at the production 128-row shape (orbit)
  - adjacent (pid, dep) duplicate pairs (live, differing payload) per view
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
from pcrhpg24_tpu.render.raster import swizzle_dims
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
REPS = 5
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
_, _, SIZE = swizzle_dims(W, H)


def streams_for(view):
    r.apply_setting(SETTINGS[view])
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
    lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)
    pid, dep, pay = render_chunk_native(
        las.dev, 0, jnp.asarray(wvp), lod_d, scale, offset_rel,
        W, H, "color", fmt="fixed", tb=tb)
    return (jax.block_until_ready(pid.astype(jnp.uint32)),
            jax.block_until_ready(dep), jax.block_until_ready(pay))


def slope_sort(pid, dep, pay, rows, nk, k2=9):
    n = pid.shape[0] // rows

    @functools.partial(jax.jit, static_argnames=("k",))
    def f(a0, k):
        acc = jnp.uint32(0)
        a = a0
        for _ in range(k):
            sp, sd, sy = jax.lax.sort(
                [a.reshape(rows, n), dep.reshape(rows, n),
                 pay.reshape(rows, n)],
                num_keys=nk, is_stable=False, dimension=1)
            # full-output xor-sample so no sort slice is DCE'd
            probe = (sp[:, ::997].sum() + sd[:, ::997].sum()
                     + sy[:, ::997].sum())
            acc += probe
            a = a0 + jnp.where(
                probe == jnp.uint32(123456789), 1, 0).astype(jnp.uint32)
        return acc

    ts = {1: 1e9, k2: 1e9}
    for k in (1, k2):
        float(f(pid, k))
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(pid, k))
            ts[k] = min(ts[k], time.perf_counter() - t0)
    ms = (ts[k2] - ts[1]) / (k2 - 1) * 1e3
    print(f"  sort ({rows:4d} x {n:6d}) nk{nk}: {ms:7.2f} ms", flush=True)
    return ms


@jax.jit
def dup_stats(pid, dep, pay):
    rows = 128
    n = pid.shape[0] // rows
    sp, sd, sy = jax.lax.sort(
        [pid.reshape(rows, n), dep.reshape(rows, n), pay.reshape(rows, n)],
        num_keys=3, is_stable=False, dimension=1)
    live = sp[:, 1:] < jnp.uint32(SIZE)
    dup = (sp[:, 1:] == sp[:, :-1]) & (sd[:, 1:] == sd[:, :-1]) & live
    dup_pay = dup & (sy[:, 1:] != sy[:, :-1])
    return dup.sum(), dup_pay.sum()


# trimmed to the decision-critical set (each distinct sort shape is a
# ~10-20 s XLA compile on this 1-core host): nk1/2/3 at the production
# row shape on the orbit streams, plus per-view (pid, dep) duplicate
# stats that tell how often an nk2 fast path would have to fall back.
for view in ("orbit", "closeup", "oblique"):
    pid, dep, pay = streams_for(view)
    d, dp = dup_stats(pid, dep, pay)
    print(f"{view}: adjacent (pid,dep) dups={int(d)} with-diff-pay={int(dp)}",
          flush=True)
    if view == "orbit":
        for nk in (1, 2, 3):
            slope_sort(pid, dep, pay, 128, nk)
