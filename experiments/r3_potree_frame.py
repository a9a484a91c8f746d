"""Anatomy of a loop_nodes steady frame (the 15 s/frame mystery).

BENCH potree_1e9 steady frame: 14.9 s at 300M resident / 144M visible —
~40x off the flagship's per-point rate.  This profiles one steady frame
on a fully-resident 50M scene (out/potree_50m, tools/synth_potree.py)
phase by phase: host prep, per-chunk node-indexed projection+sort,
window build + merge kernel, plane combines, resolve.

Run: python experiments/r3_potree_frame.py
"""
import sys, pathlib, time, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.potree_resource import PotreeData
from pcrhpg24_tpu.render.methods.loop_nodes import (
    ComputeLoopNodes, CHUNK_PTS, node_levels, _u64min_combine,
)
from pcrhpg24_tpu.render.methods.loop_las import (
    SORT_SEG, project_rows_101010_nodes, resolve_indexed,
)
from pcrhpg24_tpu.render.camera import batches_in_frustum, frustum_planes
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows
from pcrhpg24_tpu.render.raster import swizzle_dims, unswizzle_plane

W, H = 1920, 1080
SCENE = os.environ.get("SCENE", "out/potree_50m")

t0 = time.perf_counter()
p = PotreeData.create(SCENE)
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.45, pitch=-0.75, radius=6500.0,
                        target=(2048.0, 2048.0, 500.0)))
m = ComputeLoopNodes(r, p)
m.update(r)
p.wait_loaded(r)
print(f"loaded {p.num_points_loaded/1e6:.1f}M in "
      f"{time.perf_counter()-t0:.0f}s", flush=True)
r.controls_update()

# steady wall frames through the real method
for i in range(3):
    r.controls.yaw += 0.002
    r.controls_update()
    t0 = time.perf_counter()
    img = m.render(r)
    jax.block_until_ready(img)
    print(f"steady frame {i}: {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)

# phase split (replicates ComputeLoopNodes.render body)
cam = r.camera
view, proj = cam.view(), cam.proj()
wvp = jnp.asarray((proj @ view).astype(np.float32))
nn = p.nodes_loaded
bmin, bmax = p.bbox_min[:nn], p.bbox_max[:nn]


def phase(label, fn, reps=3):
    fn()  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1e3:8.1f} ms", flush=True)
    return fn()


t0 = time.perf_counter()
vis = batches_in_frustum(frustum_planes(proj @ view), bmin, bmax)
level = node_levels(view, proj, bmin, bmax, W, H)
vis &= level < 4
d = p.dev
n_pad = d["xyz4"].shape[0]
tables = m._per_point_tables(p.num_points_loaded)
code_nodes = m._frame_codes(level, vis, len(p.nodes))
nid_pt = tables["nid_pt"]
counts = p.node_count[:nn]
live = m._live_chunks(tables["starts"], counts, vis, n_pad)
print(f"host prep: {(time.perf_counter()-t0)*1e3:.1f} ms; "
      f"live chunks {list(live)}, visible "
      f"{int(counts[vis].sum())/1e6:.1f}M pts", flush=True)

wt_cols, _ht, size = swizzle_dims(W, H)
rows_per_chunk = CHUNK_PTS // SORT_SEG

parts = []
for c in live:
    s = int(c) * CHUNK_PTS
    sl = slice(s, min(s + CHUNK_PTS, n_pad))
    fn = lambda sl=sl, s=s: project_rows_101010_nodes(
        d["xyz4"][sl], d["xyz8"][sl], d["xyz12"][sl], nid_pt[sl],
        tables["bmin_nodes"], tables["bmax_nodes"], code_nodes, wvp,
        jnp.uint32(s), W, H, rows=(sl.stop - sl.start) // SORT_SEG)
    parts.append(phase(f"project+sort chunk {int(c)}", fn))

GROUP = 2
planes = []
for g0 in range(0, len(parts), GROUP):
    grp = parts[g0:g0 + GROUP]
    sp = jnp.concatenate([q[0] for q in grp])
    sd = jnp.concatenate([q[1] for q in grp])
    sy = jnp.concatenate([q[2] for q in grp])
    fn = lambda sp=sp, sd=sd, sy=sy: dense_from_sorted_rows(
        sp, sd, sy, size, need_depth=True, tile_cols=wt_cols)
    planes.append(phase(f"dense_from_sorted_rows grp {g0}", fn))

fbd, fbp = planes[0]
for gd, gp in planes[1:]:
    fbd, fbp = phase("u64min combine", lambda: _u64min_combine(
        fbd, fbp, gd, gp))

phase("unswizzle+resolve", lambda: resolve_indexed(
    unswizzle_plane(fbp, W, H), d["rgba"], W, H))
