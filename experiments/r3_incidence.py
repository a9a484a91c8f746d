"""Window/incidence statistics of the real bench stream (numpy).

Decides the merge-table redesign: current per-(stream,tile) windows vs
stream-tiling windows re-processed per (program|tile) they touch.
Counts, on the actual post-collapse sorted rows:
  * live entries / rows,
  * per-pair windows (the current kernel's iteration count),
  * stream-tiling (every-8-rows) windows that are live,
  * (stream-window, tile) incidences,
  * (stream-window, program[TPS=4 tiles]) incidences,
  * single-tile / single-program window fractions,
  * max same-pid run length within any 1024-entry window (suffix-min
    step-count specialization bound).
"""
import sys, pathlib, os
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
from pcrhpg24_tpu.render.raster import swizzle_dims
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                        target=(1000.0, 1000.0, 100.0)))
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
SWZ = swizzle_dims(W, H)[2]
pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale, offset_rel,
    W, H, "color", fmt="fixed", tb=tb)
S = SORT_ROWS
n = pid.shape[0] // S
sp = np.asarray(jax.lax.sort(
    [pid.reshape(S, n).astype(jnp.uint32)], num_keys=1, dimension=1)[0])

TILE, LANES, SUBS, TPS = 1024, 128, 8, 4
ntiles = -(-SWZ // TILE)
nprog = -(-ntiles // TPS)
live = (sp < SWZ)
nlive = int(live.sum())
print(f"rows={S} n={n} live={nlive} ({100*nlive/sp.size:.1f}%) "
      f"ntiles={ntiles} nprog={nprog}")

tile = np.minimum(sp >> 10, ntiles).astype(np.int64)

# current scheme: per-(stream, tile) windows, row-granular starts
pair_windows = 0
nonempty_pairs = 0
for s in range(S):
    t, c0 = np.unique(tile[s][live[s]], return_counts=True)
    # span from first-entry rounded down to row boundary to last entry
    idx = np.searchsorted(tile[s], t, side="left")
    idx1 = np.searchsorted(tile[s], t, side="right")
    fr = idx // LANES
    span = idx1 - fr * LANES
    pair_windows += int(np.sum((span + TILE - 1) // TILE))
    nonempty_pairs += len(t)

# stream-tiling windows: every TILE entries of each stream
Wn = n // TILE
st = tile.reshape(S, Wn, TILE)
w_live = (st[:, :, 0] < ntiles)  # window dead iff its first entry is OOB
t_lo = st[:, :, 0]
# last LIVE entry's tile per window
last_live = np.where(st < ntiles, st, -1).max(axis=2)
t_hi = np.maximum(last_live, t_lo)
inc_tile = int(np.sum(np.where(w_live, t_hi - t_lo + 1, 0)))
p_lo, p_hi = t_lo // TPS, t_hi // TPS
inc_prog = int(np.sum(np.where(w_live, p_hi - p_lo + 1, 0)))
live_windows = int(w_live.sum())
single_tile = int(np.sum(w_live & (t_hi == t_lo)))
single_prog = int(np.sum(w_live & (p_hi == p_lo)))
print(f"per-pair windows (current): {pair_windows} "
      f"(nonempty pairs {nonempty_pairs})")
print(f"stream-tiling windows live: {live_windows}")
print(f"(window,tile) incidences:   {inc_tile} "
      f"(single-tile {100*single_tile/max(live_windows,1):.0f}%)")
print(f"(window,prog) incidences:   {inc_prog} "
      f"(single-prog {100*single_prog/max(live_windows,1):.0f}%)")

# max same-pid run length within any window (and global, for reference)
mx = 0
for s in range(S):
    v = sp[s][live[s]]
    if not v.size:
        continue
    brk = np.nonzero(np.diff(v) != 0)[0]
    edges = np.concatenate([[-1], brk, [v.size - 1]])
    runs = np.diff(edges)
    mx = max(mx, int(runs.max()))
print(f"max same-pid run within a stream: {mx}")
# distribution of run lengths > 64
for s in range(S):
    v = sp[s][live[s]]
    if not v.size:
        continue
print("percentile runs: ", end="")
allruns = []
for s in range(S):
    v = sp[s][live[s]]
    if not v.size:
        continue
    brk = np.nonzero(np.diff(v) != 0)[0]
    edges = np.concatenate([[-1], brk, [v.size - 1]])
    allruns.append(np.diff(edges))
ar = np.concatenate(allruns)
print({q: int(np.percentile(ar, q)) for q in (50, 90, 99, 99.9, 100)})
