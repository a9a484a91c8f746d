"""The >HBM scale proof: stream a 1e9-point Potree scene while rendering.

Dataset: out/potree_1b (tools/synth_potree.py, ~17 GiB on disk,
999,996,080 points).  Device residency is capped by budget_points —
bins stream coarse-first until the cap, so the resident set is always
a valid LOD prefix and frames render THROUGHOUT loading (the
reference's equivalent run: 4.1B-point scenes configured in
src/main.cpp:87,115 through PotreeData's bin streaming,
modules/compute/PotreeData.h:288-311, 575-605).

Records into docs/scale_runs.json: frame times sampled during load,
steady-state frame time at full residency, peak HBM.
"""
import sys, pathlib, time, os, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.potree_resource import PotreeData
from pcrhpg24_tpu.render.methods.loop_nodes import ComputeLoopNodes

W, H = 1920, 1080
BUDGET = int(float(os.environ.get("BUDGET", "4e8")))
SCENE = os.environ.get("SCENE", "out/potree_1b")

p = PotreeData.create(SCENE, budget_points=BUDGET)
total_disk = 999_996_080 if "1b" in SCENE else p.num_points
print(f"dataset nodes={len(p.nodes)} resident budget={BUDGET/1e6:.0f}M "
      f"resident={p.total_points/1e6:.1f}M limited={p.resident_limited}",
      flush=True)
assert p.resident_limited, "budget must be < dataset for the >HBM proof"

r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.45, pitch=-0.75, radius=6500.0,
                        target=(2048.0, 2048.0, 500.0)))
m = ComputeLoopNodes(r, p)
m.update(r)
p.load(r)

# compile warmup: the single-dispatch frame (render_frame_nodes_tpu)
# compiles once for the fixed capacity shapes.  Real deployments warm
# the executable before streaming; keeping the compile out of the load
# loop keeps load-time frames bounded by actual per-frame work.
while p.nodes_loaded == 0 and p.state.name != "LOADED":
    p.process(r, max_bins=1)
    time.sleep(0.05)
t0 = time.perf_counter()
for _ in range(2):
    jax.block_until_ready(r.loop(m.update, m.render, frames=1))
print(f"warmup (compile) {time.perf_counter() - t0:.1f}s", flush=True)

samples = []
t_start = time.perf_counter()
last = -1
while p.state.name != "LOADED":
    t0 = time.perf_counter()
    # several bins per rendered frame: each bin's host->device upload
    # rides the axon tunnel (~20 MB/s), so frame-per-bin pacing is
    # tunnel-bound; real deployments upload at PCIe/HBM rates
    p.process(r, max_bins=8)
    img = r.loop(m.update, m.render, frames=1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    if p.nodes_loaded != last:
        samples.append(dict(
            t_s=round(time.perf_counter() - t_start, 1),
            nodes=p.nodes_loaded, mpts=round(p.num_points_loaded / 1e6, 1),
            frame_ms=round(dt * 1e3, 1)))
        last = p.nodes_loaded
        if len(samples) % 5 == 1:
            print(samples[-1], flush=True)
load_s = time.perf_counter() - t_start
print(f"loaded {p.num_points_loaded/1e6:.1f}M resident in {load_s:.0f}s",
      flush=True)

# steady state: min-of-5 wall frames (single dispatch each; the tunnel
# adds ~0.1s one-sided, min rejects it)
best = 1e9
for i in range(5):
    r.controls.yaw += 0.002
    t0 = time.perf_counter()
    img = r.loop(m.update, m.render, frames=1)
    jax.block_until_ready(img)
    best = min(best, time.perf_counter() - t0)
stats = jax.local_devices()[0].memory_stats() or {}
peak = stats.get("peak_bytes_in_use", 0)
if not peak:
    # axon exposes no allocator stats; take XLA's own allocation plan
    # for the steady frame executable (arguments include the resident
    # planes; temps are the transient sorted streams etc.) — a real
    # number from the compiler, not a guess
    try:
        from pcrhpg24_tpu.render.methods.loop_nodes import (
            CHUNK_PTS, render_frame_nodes_tpu,
        )

        d = p.dev
        n_pad = int(d["xyz4"].shape[0])
        chunk_pts = min(CHUNK_PTS, n_pad)
        ncap = (n_pad + chunk_pts - 1) // chunk_pts
        tables = m._per_point_tables(p.num_points_loaded)
        live_idx = jnp.zeros((ncap,), jnp.int32)
        cap2 = tables["cap2"]
        lowered = render_frame_nodes_tpu.lower(
            d["xyz4"], d["xyz8"], d["xyz12"], tables["starts_d"],
            jnp.zeros((cap2,), jnp.int32), tables["bmin_delta"],
            tables["bmax_delta"], jnp.zeros((ncap,), jnp.int32),
            tables["base_bmin"], tables["base_bmax"],
            jnp.zeros((4, 4), jnp.float32), live_idx, jnp.int32(0),
            W, H, ncap, chunk_pts)
        ma = lowered.compile().memory_analysis()
        peak = (getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
                + getattr(ma, "temp_size_in_bytes", 0))
    except Exception as e:
        print("memory_analysis failed:", e, flush=True)
# visible work this frame (the LOD cut's decision, not the resident set)
nn = p.nodes_loaded
from pcrhpg24_tpu.render.methods.loop_nodes import node_levels
from pcrhpg24_tpu.render.camera import batches_in_frustum, frustum_planes
cam = r.camera
view, proj = cam.view(), cam.proj()
vis = batches_in_frustum(frustum_planes(proj @ view),
                         p.bbox_min[:nn], p.bbox_max[:nn])
lvl = node_levels(view, proj, p.bbox_min[:nn], p.bbox_max[:nn], W, H)
vis &= lvl < 4
vis_pts = int(p.node_count[:nn][vis].sum())
entry = dict(
    dataset_points=int(total_disk),
    resident_points=int(p.num_points_loaded),
    budget_points=BUDGET,
    visible_points=vis_pts,
    steady_frame_ms=round(best * 1e3, 1),
    load_s=round(load_s, 1),
    peak_hbm_gib=round(peak / 2**30, 2),
    frames_during_load=len(samples),
    load_samples=samples[:: max(1, len(samples) // 12)],
    method="loop_nodes",
)
print(json.dumps({k: v for k, v in entry.items() if k != "load_samples"}),
      flush=True)
led = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "scale_runs.json")
runs = json.load(open(led)) if os.path.exists(led) else {}
runs["potree_1e9"] = entry
json.dump(runs, open(led, "w"), indent=1, sort_keys=True)
print("ledger updated", flush=True)

# screenshot for docs
from pcrhpg24_tpu.utils.png import write_png
from pcrhpg24_tpu.render.raster import image_to_rgb8
write_png("docs/preview_potree1b.png", np.asarray(image_to_rgb8(img)))
