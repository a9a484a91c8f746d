"""Generate a 2-billion-point `.tpc` scene out of core.

The upstream capability claim is 2B points real-time (reference
README.md:41-44; largest configured scene 4.1B, src/main.cpp:87).  The
bench ladder tops out at 402M resident; this writes the >HBM dataset
the streamed-residency proof (r5_flagship_2b.py) renders from.

Same cloud family as the bench ladder (terrain_cloud at extent 2000,
one RNG stream per 6.55M-point chunk, per-chunk Morton sort — exactly
preprocess_las_tpc's pipeline, reference process_chunk
src/preprocess.cpp:925-1165), but generated and written chunk by
chunk: ~30 GB of LAS intermediate and ~12 GB of in-RAM batch blobs
never materialize.

    python experiments/r5_synth_2b.py            # 30518 batches = 2.0003e9
    BATCHES=1024 python experiments/r5_synth_2b.py  # smaller smoke run
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from pcrhpg24_tpu.codec.bc1 import encode_bc1
from pcrhpg24_tpu.codec.fixed import encode_fixed_batch
from pcrhpg24_tpu.constants import POINTS_PER_WORKGROUP
from pcrhpg24_tpu.formats.native_file import MAGIC2, batch_to_blob_v2
from pcrhpg24_tpu.preprocess import MAX_POINTS_PER_BATCH, morton_order
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

BATCHES = int(os.environ.get("BATCHES", "30518"))
OUT = os.environ.get("OUT", f"out/bench_{BATCHES}.tpc")
EXTENT = 2000.0
SCALE = np.asarray([0.001, 0.001, 0.001])
OFFSET = np.zeros(3)

n_total = BATCHES * POINTS_PER_WORKGROUP
print(f"writing {OUT}: {BATCHES} batches = {n_total/1e9:.4f}B points",
      flush=True)

hdr_fixed = 4 + 24 + 96
sizes = np.zeros(BATCHES, np.int64)
max_gw = 0
las_min = np.full(3, np.inf)
las_max = np.full(3, -np.inf)
bi = 0
t0 = time.time()
with open(OUT, "wb") as f:
    f.seek(hdr_fixed + 8 * BATCHES)
    chunk_id = 0
    remaining = n_total
    while remaining > 0:
        count = min(MAX_POINTS_PER_BATCH, remaining)
        xyz, rgb = terrain_cloud(count, seed=1000 + chunk_id, extent=EXTENT)
        grid = cloud_to_grid(xyz)
        x, y, z = grid[:, 0], grid[:, 1], grid[:, 2]
        color = (rgb[:, 0].astype(np.uint32)
                 | rgb[:, 1].astype(np.uint32) << 8
                 | rgb[:, 2].astype(np.uint32) << 16)
        pad = (-count) % POINTS_PER_WORKGROUP
        if pad:
            x = np.concatenate([x, np.full(pad, x[-1], x.dtype)])
            y = np.concatenate([y, np.full(pad, y[-1], y.dtype)])
            z = np.concatenate([z, np.full(pad, z[-1], z.dtype)])
            color = np.concatenate([color, np.full(pad, color[-1],
                                                   color.dtype)])
        order = morton_order(x, y, z)
        x, y, z, color = x[order], y[order], z[order], color[order]
        wmin = grid.min(axis=0).astype(np.float64) * SCALE + OFFSET
        wmax = grid.max(axis=0).astype(np.float64) * SCALE + OFFSET
        las_min = np.minimum(las_min, wmin)
        las_max = np.maximum(las_max, wmax)
        for s in range(0, len(x), POINTS_PER_WORKGROUP):
            sl = slice(s, s + POINTS_PER_WORKGROUP)
            fb = encode_fixed_batch(x[sl], y[sl], z[sl])
            blob = batch_to_blob_v2(fb, encode_bc1(color[sl]))
            f.write(blob)
            sizes[bi] = len(blob)
            max_gw = max(max_gw, fb.streams.shape[1])
            bi += 1
        remaining -= count
        chunk_id += 1
        if chunk_id % 8 == 1:
            done = bi * POINTS_PER_WORKGROUP
            rate = done / max(time.time() - t0, 1e-9)
            print(f"  {done/1e6:.0f}M pts, {rate/1e6:.1f} Mpts/s, "
                  f"eta {(n_total-done)/max(rate,1):.0f}s", flush=True)
    f.seek(0)
    f.write(MAGIC2)
    f.write(np.asarray([n_total, BATCHES, max_gw], np.int64).tobytes())
    for arr in (SCALE, OFFSET, las_min, las_max):
        f.write(np.asarray(arr, np.float64).tobytes())
    f.write(sizes.tobytes())
print(f"done in {time.time()-t0:.0f}s, "
      f"{os.path.getsize(OUT)/2**30:.2f} GiB", flush=True)
