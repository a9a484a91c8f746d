"""Potree steady-frame decomposition: why is loop_nodes 5x slower/point?

BENCH_r04: potree_1e9 steady frame 961 ms at 145M visible = 0.15
Gpts/s vs 0.78 on the flagship chunk path — same merge kernel, so the
delta is in the nodes-path plumbing.  Phases, device-traced
(utils/devtime — wall clock through the axon tunnel is useless at the
ms scale) on the most-populated live chunk (16.7M points):

  planes    XOR-delta scatter + 7 prefix scans (code/bmin/bmax)
  proj      projection without the row sort
  sort1/3   the row sort alone, num_keys=1 vs 3
  merge     dense_from_sorted_rows (suffix path vs fully_sorted)
  frame     whole render_frame_nodes_tpu over the live chunks

Variants measured end-to-end per chunk:
  A current   nk1 sort + suffix merge, payload = point index (pay32)
  D collapse  flat same-pixel run collapse + nk3 + suffix-free merge

    BUDGET=3.4e7 python experiments/r5_potree_parts.py
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from functools import partial

from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.potree_resource import PotreeData
from pcrhpg24_tpu.render.methods.loop_nodes import (
    CHUNK_PTS, ComputeLoopNodes, _xor_prefix_scan, node_levels,
    render_frame_nodes_tpu,
)
from pcrhpg24_tpu.render.methods.loop_las import (
    SORT_SEG, _project_101010,
)
from pcrhpg24_tpu.render.camera import batches_in_frustum, frustum_planes
from pcrhpg24_tpu.render.raster import EMPTY, swizzle_dims, swizzle_pid
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
BUDGET = int(float(os.environ.get("BUDGET", "3.4e7")))
SCENE = os.environ.get("SCENE", "out/potree_1b")

p = PotreeData.create(SCENE, budget_points=BUDGET)
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.45, pitch=-0.75, radius=6500.0,
                        target=(2048.0, 2048.0, 500.0)))
m = ComputeLoopNodes(r, p)
m.update(r)
p.load(r)
t0 = time.perf_counter()
while p.state.name != "LOADED":
    p.process(r, max_bins=16)
    time.sleep(0.01)
p.process(r)
print(f"loaded {p.num_points_loaded/1e6:.1f}M in "
      f"{time.perf_counter()-t0:.0f}s, nodes={p.nodes_loaded}", flush=True)

r.controls_update()
cam = r.camera
wvp = jnp.asarray((cam.proj() @ cam.view()).astype(np.float32))
nn = p.nodes_loaded
lvl = node_levels(cam.view(), cam.proj(), p.bbox_min[:nn], p.bbox_max[:nn],
                  W, H)
vis = batches_in_frustum(frustum_planes(np.asarray(wvp)),
                         p.bbox_min[:nn], p.bbox_max[:nn]) & (lvl < 4)
d = p.dev
n_pad = int(d["xyz4"].shape[0])
tables = m._per_point_tables(p.num_points_loaded)
codes = m._frame_codes(lvl, vis, len(p.nodes))
code_delta, base_code = m._frame_code_deltas(np.asarray(codes), tables)
chunk_pts, ncap = tables["chunk_pts"], tables["ncap"]
live = m._live_chunks(tables["starts"], p.node_count[:nn], vis, n_pad)
live_idx = np.zeros(ncap, np.int32)
live_idx[: len(live)] = live
print(f"live chunks {len(live)}/{ncap}, chunk_pts {chunk_pts}", flush=True)
wt_cols, _htn, size = swizzle_dims(W, H)
rows = chunk_pts // SORT_SEG
counts_h = p.node_count[:nn]
vis_pts = int(counts_h[np.flatnonzero(vis)].sum())
print(f"visible points {vis_pts/1e6:.1f}M", flush=True)

# ---- whole frame (single dispatch, device-traced) ----
frame = partial(render_frame_nodes_tpu, width=W, height=H, ncap=ncap,
                chunk_pts=chunk_pts)
fargs = (d["xyz4"], d["xyz8"], d["xyz12"], tables["starts_d"],
         code_delta, tables["bmin_delta"], tables["bmax_delta"],
         base_code, tables["base_bmin"], tables["base_bmax"], wvp,
         jnp.asarray(live_idx), jnp.int32(len(live)))
jax.block_until_ready(frame(*fargs))
ms_frame = min(device_ms(frame, *fargs, key="jit_render_frame_nodes_tpu")
               for _ in range(3))
print(f"frame      {ms_frame:8.2f} ms  ({vis_pts/ms_frame/1e6:.2f} Gpts/s)",
      flush=True)

# ---- per-chunk stages ----
best_c = int(live[0]) if len(live) else 0
cval = jnp.int32(best_c)


@jax.jit
def planes_of(code_delta, base_code, c):
    s = jnp.minimum(c * chunk_pts, n_pad - chunk_pts).astype(jnp.int32)
    idx = tables["starts_d"] - s
    idx = jnp.where(idx < 0, chunk_pts, idx)

    def plane(deltas, base):
        pl = jnp.zeros((chunk_pts,), jnp.int32).at[idx].add(
            deltas, mode="drop")
        return base ^ _xor_prefix_scan(pl)

    code_pt = plane(code_delta, base_code[c])
    f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    bmi = tuple(f32(plane(tables["bmin_delta"][:, k],
                          tables["base_bmin"][c, k])) for k in range(3))
    bma = tuple(f32(plane(tables["bmax_delta"][:, k],
                          tables["base_bmax"][c, k])) for k in range(3))
    return s, code_pt, bmi, bma


S0, CODE0, BMI0, BMA0 = jax.block_until_ready(
    planes_of(code_delta, base_code, cval))
ms_planes = min(device_ms(planes_of, code_delta, base_code, cval,
                          key="jit_planes_of") for _ in range(3))
print(f"planes     {ms_planes:8.2f} ms/chunk (x{len(live)} chunks)",
      flush=True)


@jax.jit
def project_flat(x4, x8, x12, s, code_pt, bmi, bma):
    sl = lambda a: jax.lax.dynamic_slice(a, (s,), (chunk_pts,))
    lvl_ = (code_pt >> 1) & 7
    vis_ = (code_pt & 1) == 1
    pid, depth, pay = _project_101010(
        sl(x4), sl(x8), sl(x12), lvl_, bmi, bma, wvp,
        s.astype(jnp.uint32), W, H, vis_)
    lin = jnp.clip(pid, 0, W * H - 1)
    spid = jnp.where(pid < W * H,
                     swizzle_pid(lin % W, lin // W, W).astype(jnp.uint32),
                     jnp.uint32(size))
    return spid, depth, pay


SP0, SD0, SY0 = jax.block_until_ready(project_flat(
    d["xyz4"], d["xyz8"], d["xyz12"], S0, CODE0, BMI0, BMA0))
ms_proj = min(device_ms(project_flat, d["xyz4"], d["xyz8"], d["xyz12"],
                        S0, CODE0, BMI0, BMA0,
                        key="jit_project_flat") for _ in range(3))
print(f"proj       {ms_proj:8.2f} ms/chunk", flush=True)


def mk_sort(nk):
    @jax.jit
    def sort_rows(sp, sd, sy):
        n = sp.shape[0] // rows
        return jax.lax.sort([sp.reshape(rows, n), sd.reshape(rows, n),
                             sy.reshape(rows, n)],
                            num_keys=nk, is_stable=False, dimension=1)
    return sort_rows


sort1, sort3 = mk_sort(1), mk_sort(3)
R1 = jax.block_until_ready(sort1(SP0, SD0, SY0))
R3 = jax.block_until_ready(sort3(SP0, SD0, SY0))
ms_s1 = min(device_ms(sort1, SP0, SD0, SY0, key="jit_sort_rows")
            for _ in range(3))
ms_s3 = min(device_ms(sort3, SP0, SD0, SY0, key="jit_sort_rows")
            for _ in range(3))
print(f"sort nk1   {ms_s1:8.2f} ms/chunk   nk3 {ms_s3:8.2f}", flush=True)


def mk_merge(fully, pay_bits):
    @jax.jit
    def merge(sp, sd, sy):
        return dense_from_sorted_rows(
            sp, sd, sy, size, need_depth=True, tile_cols=wt_cols,
            fully_sorted=fully, pay_bits=pay_bits)
    return merge


m1 = mk_merge(False, 32)
m3 = mk_merge(True, 32)
jax.block_until_ready(m1(*R1))
jax.block_until_ready(m3(*R3))
ms_m1 = min(device_ms(m1, *R1, key="jit_merge") for _ in range(3))
ms_m3 = min(device_ms(m3, *R3, key="jit_merge") for _ in range(3))
print(f"merge nk1+suffix {ms_m1:8.2f} ms/chunk   nk3 suffix-free {ms_m3:8.2f}",
      flush=True)

spid_np = np.asarray(R1[0])
livecnt = int((spid_np < size).sum())
print(f"live entries {livecnt/1e6:.2f}M of {chunk_pts/1e6:.1f}M", flush=True)


# ---- variant D: flat run collapse before sort ----
@jax.jit
def collapse_flat(sp, sd, sy):
    pid, dch, pch = sp, sd, sy
    for s_ in (1, 2, 4, 8, 16, 32):
        pid_s = jnp.pad(pid, (0, s_), constant_values=size)[s_:]
        d_s = jnp.pad(dch, (0, s_))[s_:]
        p_s = jnp.pad(pch, (0, s_))[s_:]
        valid = pid_s == pid
        less = (d_s < dch) | ((d_s == dch) & (p_s < pch))
        take = valid & less
        dch = jnp.where(take, d_s, dch)
        pch = jnp.where(take, p_s, pch)
    prev = jnp.pad(pid, (1, 0), constant_values=size)[:-1]
    head = pid != prev
    pid = jnp.where(head, pid, jnp.uint32(size))
    return pid, dch, pch


CP, CD_, CY = jax.block_until_ready(collapse_flat(SP0, SD0, SY0))
livec = int((np.asarray(CP) < size).sum())
print(f"collapsed live {livec/1e6:.2f}M (was {livecnt/1e6:.2f}M)", flush=True)
ms_col = min(device_ms(collapse_flat, SP0, SD0, SY0,
                       key="jit_collapse_flat") for _ in range(3))
RC3 = jax.block_until_ready(sort3(CP, CD_, CY))
ms_s3c = min(device_ms(sort3, CP, CD_, CY, key="jit_sort_rows")
             for _ in range(3))
jax.block_until_ready(m3(*RC3))
ms_m3c = min(device_ms(m3, *RC3, key="jit_merge") for _ in range(3))
print(f"collapse   {ms_col:8.2f} ms/chunk; then sort nk3 {ms_s3c:8.2f} "
      f"merge {ms_m3c:8.2f}", flush=True)

# exactness gates
gd1, gp1 = m1(*R1)
gd3, gp3 = m3(*R3)
gdc, gpc = m3(*RC3)
print("nk3 == nk1:", bool((gd1 == gd3).all()), bool((gp1 == gp3).all()),
      flush=True)
print("collapse == nk1:", bool((gd1 == gdc).all()), bool((gp1 == gpc).all()),
      flush=True)

tot_a = ms_planes + ms_proj + ms_s1 + ms_m1
tot_d = ms_planes + ms_proj + ms_col + ms_s3c + ms_m3c
print(f"per-chunk A(current) {tot_a:.2f} ms -> D(collapse+nk3) {tot_d:.2f}",
      flush=True)
