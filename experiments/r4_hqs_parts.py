"""HQS frame decomposition: where do the 1.87x-of-color ms go?

Stages on the bench orbit view (SCENE=out/bench_64.tpc or a scale
scene), device-slope timed:
  color     render_frame_native (the color frame, for the ratio)
  prepass   hqs_prepass_native  (decode+project(no collapse)+nk3 sorts
                                 + pay_bits=0 min-merge)
  blend     hqs_blend_native on prepass outputs (sum kernel + divide)
  hqs       prepass + blend chained (the real frame)
Also: windows count for collapsed (color) vs uncollapsed (hqs) rows —
the run collapse the blend semantics forbid is the structural delta.

    python experiments/r4_hqs_parts.py
"""
import sys, pathlib, os, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    CHUNK, render_frame_native,
)
from pcrhpg24_tpu.render.methods.huffman_tpu_hqs import (
    hqs_blend_native, hqs_prepass_native,
)
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
K = 6
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
las.wait_loaded()
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                        target=(1000.0, 1000.0, 100.0)))
r.controls_update()
cam = r.camera
B = las.num_batches_loaded
fp = np.zeros(40, np.float32)
fp[0:16] = cam.view().astype(np.float32).reshape(-1)
fp[16:22] = cam.proj_params().astype(np.float32)
fp[22] = 1.0
fp[23] = float(B)
fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
fpd = jnp.asarray(fp)
scale = jnp.asarray(las.scale, jnp.float32)
offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
NCH = (B + CHUNK - 1) // CHUNK
kw = dict(width=W, height=H, nchunks=NCH, use_pallas=True, cull=True,
          fmt="fixed", points=64)


def tok_of(x):
    return jnp.where(x == jnp.uint32(0xFFFFFFFF), jnp.float32(1),
                     jnp.float32(0))


@jax.jit
def chain_color(dev, fpd, k):
    # fori_loop with RUNTIME k: one compile serves every chain length
    # (a static-k unroll at 100M blew the compile budget, bench.py
    # round-4 lesson)
    def body(_i, carry):
        acc, f = carry
        _d, _p, img = render_frame_native(
            dev, f, scale, offr, mode="color", need_depth=False, tb=tb,
            **kw)
        acc = acc + img[0, 0]
        return acc, fpd + tok_of(acc)

    acc, _f = jax.lax.fori_loop(0, k, body, (jnp.uint32(0), fpd))
    return acc


@jax.jit
def chain_prepass(dev, fpd, k):
    def body(_i, carry):
        acc, f = carry
        fbd, _streams = hqs_prepass_native(dev, f, scale, offr, tb=tb,
                                           **kw)
        acc = acc + fbd[0]
        return acc, fpd + tok_of(acc)

    acc, _f = jax.lax.fori_loop(0, k, body, (jnp.uint32(0), fpd))
    return acc


fbd0, streams0 = jax.block_until_ready(hqs_prepass_native(
    las.dev, fpd, scale, offr, tb=tb, **kw))


@jax.jit
def chain_blend(dev, fbd, streams, k):
    def body(_i, carry):
        acc, fb = carry
        _n, img = hqs_blend_native(dev, fpd, scale, offr, fb, streams,
                                   tb=tb, **kw)
        acc = acc + img[0, 0]
        return acc, jnp.where(tok_of(acc) > 0, fbd + 1, fbd)

    acc, _fb = jax.lax.fori_loop(0, k, body, (jnp.uint32(0), fbd))
    return acc


def slope(fn, *args):
    ts = {}
    for k in (1, 1 + K):
        ko = jnp.int32(k)
        o = fn(*args, ko)
        jax.block_until_ready(o)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn(*args, ko)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        ts[int(k)] = best
    return (ts[1 + K] - ts[1]) / K * 1e3


c = slope(chain_color, las.dev, fpd)
p = slope(chain_prepass, las.dev, fpd)
b = slope(chain_blend, las.dev, fbd0, streams0)
print(f"color   {c:8.2f} ms", flush=True)
print(f"prepass {p:8.2f} ms  (decode+project nocollapse+sort+min-merge)",
      flush=True)
print(f"blend   {b:8.2f} ms  (sum kernel + divide)", flush=True)
print(f"hqs     {p + b:8.2f} ms = {(p + b) / c:.2f}x color", flush=True)

# window counts: collapsed vs uncollapsed streams (the structural delta)
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import swizzle_dims

wt_cols, _ht, SIZE = swizzle_dims(W, H)
sps, _sd, _sy = streams0
nw_h = 0
for g0 in range(0, sps.shape[0], 128):
    cw, _wr, _nr, _np_ = pm.build_rows_window_table(
        sps[g0:g0 + 128], SIZE, wide=1, clip=pm.CLIP_TILES,
        tile_cols=wt_cols)
    nw_h += int(np.asarray(cw)[-1])
print(f"hqs windows (uncollapsed): {nw_h}", flush=True)

# record into the scale-run ledger (README regeneration input)
import json
led = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "scale_runs.json")
runs = json.load(open(led)) if os.path.exists(led) else {}
pts = int(B) * 65536
runs.setdefault("hqs", {})[str(pts)] = dict(
    frame_ms=round(p + b, 2), x_color=round((p + b) / c, 2))
json.dump(runs, open(led, "w"), indent=1, sort_keys=True)
print("ledger updated", flush=True)
