"""Slope-time v2 (per-tile windows) vs v3 (sequential windows) merge on
the real bench stream, plus TPU exactness of v3 vs the XLA dedup path.
v3 was removed after this measurement (slower); run at commit d40b55f."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu, render_chunk_native
from pcrhpg24_tpu.render.pallas_merge import (
    dense_from_sorted_nk1_multi, dense_from_sorted_seq_multi,
)
from pcrhpg24_tpu.render.raster import sorted_resolve_u64_min

W, H = 1920, 1080
Debug.lod = 1.0
import os
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
from pcrhpg24_tpu.render.methods.huffman_tpu import CHUNK
nch = (las.num_batches_loaded + CHUNK - 1) // CHUNK
raw = [render_chunk_native(
    las.dev, c * CHUNK, jnp.asarray(wvp), jnp.asarray(lod_full), scale,
    offset_rel, W, H, "color", fmt="fixed") for c in range(nch)]
SIZE = W * H
parts = [tuple(jax.block_until_ready(jax.lax.sort(
    [p.astype(jnp.uint32), d, y], num_keys=1, is_stable=False)))
    for p, d, y in raw]

nreal = int(sum((np.asarray(sp) < SIZE).sum() for sp, _, _ in parts))
print(f"N={sum(p[0].shape[0] for p in parts)} real={nreal} "
      f"chunks={nch}", flush=True)

# exactness on hardware first
ref_d, ref_p = sorted_resolve_u64_min(
    jnp.concatenate([p for p, _, _ in raw]) if nch > 1 else raw[0][0],
    jnp.concatenate([d for _, d, _ in raw]) if nch > 1 else raw[0][1],
    jnp.concatenate([y for _, _, y in raw]) if nch > 1 else raw[0][2],
    SIZE, True,
)
got_d, got_p = dense_from_sorted_seq_multi(parts, SIZE, True)
okp = (np.asarray(got_p) == np.asarray(ref_p)).mean()
okd = (np.asarray(got_d) == np.asarray(ref_d)).mean()
print(f"seq vs scatter: payload agree {okp:.6f} depth agree {okd:.6f}",
      flush=True)
assert okp == 1.0 and okd == 1.0, "v3 mismatch on hardware"


def slope(fn, label):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        acc = jnp.uint32(0)
        for _ in range(k):
            ps = [(a if i == 0 else p, d, y)
                  for i, (p, d, y) in enumerate(parts)]
            _d, p = fn(ps, SIZE, True)
            probe = p[0]
            a = a + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(a.dtype)
            acc += probe
        return acc

    ts = {}
    for k in (1, 4):
        float(chain(parts[0][0], k=k))
        t0 = time.perf_counter()
        float(chain(parts[0][0], k=k))
        ts[k] = time.perf_counter() - t0
    print(f"{label}: {(ts[4]-ts[1])/3*1e3:7.2f} ms", flush=True)


slope(dense_from_sorted_nk1_multi, "merge v2 (per-tile windows)")
slope(dense_from_sorted_seq_multi, "merge v3 (sequential windows)")
