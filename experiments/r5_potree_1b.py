"""1B-point Potree: interactive steady frame via the compact budgeted path.

Round-4 record: 961.5 ms steady frame at 300M resident / 145M visible
(the chunked frame is O(resident)).  Round 5 adds the per-node prefix
budget + O(visible) compact frame (render_frame_nodes_compact); this
rerun records the new steady state into docs/scale_runs.json:

* steady_frame_ms      device-traced compact color frame (the axon
                       tunnel makes wall clock useless at this scale)
* steady_frame_direct_ms  the unbudgeted chunked frame, same camera
                       (the round-4 number's method, for the ledger)
* hqs_steady_frame_ms  compact HQS accumulate pass
* equality gate        compact vs direct budgeted planes, bit-exact
                       on device at the steady camera

    BUDGET=3e8 DENSITY=2.0 python experiments/r5_potree_1b.py
"""
import sys, pathlib, time, os, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from functools import partial

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.potree_resource import PotreeData
from pcrhpg24_tpu.render.methods.loop_nodes import (
    CHUNK_PTS, COMPACT_SEG, ComputeLoopNodes, node_budget, node_levels,
    render_frame_nodes_compact, render_frame_nodes_compact_hqs,
    render_frame_nodes_tpu,
)
from pcrhpg24_tpu.render.camera import batches_in_frustum, frustum_planes
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
BUDGET = int(float(os.environ.get("BUDGET", "3e8")))
DENSITY = float(os.environ.get("DENSITY", "2.0"))
SCENE = os.environ.get("SCENE", "out/potree_1b")

p = PotreeData.create(SCENE, budget_points=BUDGET)
total_disk = 999_996_080 if "1b" in SCENE else p.num_points
print(f"dataset nodes={len(p.nodes)} resident budget={BUDGET/1e6:.0f}M "
      f"resident={p.total_points/1e6:.1f}M limited={p.resident_limited}",
      flush=True)

r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.45, pitch=-0.75, radius=6500.0,
                        target=(2048.0, 2048.0, 500.0)))
Debug.node_budget = DENSITY  # the engine render path goes compact
m = ComputeLoopNodes(r, p)
m.update(r)
p.load(r)

# warm the compact-frame executable on the first loaded bins
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

# ---- steady state ----
r.controls_update()
cam = r.camera
wvp = jnp.asarray((cam.proj() @ cam.view()).astype(np.float32))
nn = p.nodes_loaded
view, proj = cam.view(), cam.proj()
vis = batches_in_frustum(frustum_planes(proj @ view),
                         p.bbox_min[:nn], p.bbox_max[:nn])
lvl = node_levels(view, proj, p.bbox_min[:nn], p.bbox_max[:nn], W, H)
vis &= lvl < 4
vis_pts = int(p.node_count[:nn][vis].sum())
take = node_budget(view, proj, p.bbox_min[:nn], p.bbox_max[:nn],
                   p.node_count[:nn], W, H, density=DENSITY)
d = p.dev
n_pad = int(d["xyz4"].shape[0])

t0 = time.perf_counter()
ct = m._compact_frame_tables(vis, lvl, take)
host_ms = (time.perf_counter() - t0) * 1e3
cargs = (d["xyz4"], d["xyz8"], d["xyz12"], ct["seg_src"], ct["ev_pos"],
         ct["ev_code"], ct["ev_end"], ct["ev_off"], ct["ev_bmin"],
         ct["ev_bmax"], ct["base_ev"], wvp, ct["n_live"])
ckw = dict(width=W, height=H, ncap=ct["ncap"], chunk_pts=ct["chunk_pts"],
           seg=COMPACT_SEG)
cfn = partial(render_frame_nodes_compact, **ckw)
cfd, cfp = jax.block_until_ready(cfn(*cargs))
ms_c = min(device_ms(cfn, *cargs, key="jit_render_frame_nodes_compact")
           for _ in range(3))
print(f"compact steady frame {ms_c:.1f} ms device (host tables "
      f"{host_ms:.0f} ms), budgeted {ct['budgeted_pts']/1e6:.1f}M of "
      f"{vis_pts/1e6:.1f}M visible", flush=True)

# direct (unbudgeted) chunked frame — the round-4 method, for the record
tables = m._per_point_tables(p.num_points_loaded)
codes64 = m._frame_codes(lvl, vis, len(p.nodes))
cd64, bc64 = m._frame_code_deltas(np.asarray(codes64), tables)
chunk_pts, ncap = tables["chunk_pts"], tables["ncap"]
live = m._live_chunks(tables["starts"], p.node_count[:nn], vis, n_pad)
live_idx = np.zeros(ncap, np.int32)
live_idx[: len(live)] = live
dargs = (d["xyz4"], d["xyz8"], d["xyz12"], tables["starts_d"], cd64,
         tables["bmin_delta"], tables["bmax_delta"], bc64,
         tables["base_bmin"], tables["base_bmax"], wvp,
         jnp.asarray(live_idx), jnp.int32(len(live)))
dkw = dict(width=W, height=H, ncap=ncap, chunk_pts=chunk_pts)
dfn = partial(render_frame_nodes_tpu, **dkw)
jax.block_until_ready(dfn(*dargs))
ms_d = device_ms(dfn, *dargs, key="jit_render_frame_nodes_tpu")
print(f"direct (unbudgeted) steady frame {ms_d:.1f} ms", flush=True)

# equality gate: compact == direct at the SAME budget, on device
codes_b = m._frame_codes(lvl, vis, len(p.nodes), take)
cdb, bcb = m._frame_code_deltas(np.asarray(codes_b), tables)
gfd, gfp = dfn(d["xyz4"], d["xyz8"], d["xyz12"], tables["starts_d"], cdb,
               tables["bmin_delta"], tables["bmax_delta"], bcb,
               tables["base_bmin"], tables["base_bmax"], wvp,
               jnp.asarray(live_idx), jnp.int32(len(live)),
               sval_delta=tables["sval_delta"],
               base_sval=tables["base_sval"])
eq = bool((gfd == cfd).all()) and bool((gfp == cfp).all())
print(f"equality gate (compact == direct budgeted): {eq}", flush=True)
assert eq

# compact HQS accumulate (uses the color pass depth plane)
hargs = (d["xyz4"], d["xyz8"], d["xyz12"], d["rgba"], ct["seg_src"],
         ct["ev_pos"], ct["ev_code"], ct["ev_end"], ct["ev_off"],
         ct["ev_bmin"], ct["ev_bmax"], ct["base_ev"], cfd, wvp,
         ct["n_live"])
hfn = partial(render_frame_nodes_compact_hqs, **ckw)
jax.block_until_ready(hfn(*hargs))
ms_h = min(device_ms(hfn, *hargs,
                     key="jit_render_frame_nodes_compact_hqs")
           for _ in range(3))
print(f"compact HQS accumulate {ms_h:.1f} ms", flush=True)

# wall frame through the engine (tunnel RTT included, min-of-5)
best = 1e9
for i in range(5):
    r.controls.yaw += 0.002
    t0 = time.perf_counter()
    img = r.loop(m.update, m.render, frames=1)
    jax.block_until_ready(img)
    best = min(best, time.perf_counter() - t0)
r.controls.yaw -= 0.01
r.controls_update()

# peak HBM from XLA's allocation plan of the compact executable
peak = 0
try:
    ma = cfn.func.lower(*cargs, **ckw).compile().memory_analysis()
    peak = (getattr(ma, "argument_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            + getattr(ma, "temp_size_in_bytes", 0))
except Exception as e:
    print("memory_analysis failed:", e, flush=True)

entry = dict(
    dataset_points=int(total_disk),
    resident_points=int(p.num_points_loaded),
    budget_points=BUDGET,
    visible_points=vis_pts,
    budgeted_points=int(ct["budgeted_pts"]),
    budget_density=DENSITY,
    steady_frame_ms=round(ms_c, 1),
    steady_frame_direct_ms=round(ms_d, 1),
    hqs_steady_frame_ms=round(ms_h, 1),
    wall_frame_ms=round(best * 1e3, 1),
    equality_gate="pass",
    load_s=round(load_s, 1),
    peak_hbm_gib=round(peak / 2**30, 2),
    frames_during_load=len(samples),
    load_samples=samples[:: max(1, len(samples) // 12)],
    method="loop_nodes(compact)",
)
print(json.dumps({k: v for k, v in entry.items() if k != "load_samples"}),
      flush=True)
led = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "scale_runs.json")
runs = json.load(open(led)) if os.path.exists(led) else {}
runs["potree_1e9"] = entry
json.dump(runs, open(led, "w"), indent=1, sort_keys=True)
print("ledger updated", flush=True)

from pcrhpg24_tpu.utils.png import write_png
from pcrhpg24_tpu.render.raster import image_to_rgb8
write_png("docs/preview_potree1b.png", np.asarray(image_to_rgb8(img)))
print("wrote docs/preview_potree1b.png", flush=True)
