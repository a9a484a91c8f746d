"""Stage attribution: nk1 sort + merge-v2 vs nk3 sort + merge-v1,
on real frame data from the bench scene."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu, render_chunk_native, CHUNK
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted, dense_from_sorted_nk1

W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create("out/bench_64.tpc")
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
lod_dev = jnp.asarray(lod_full)

pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), lod_dev, scale, offset_rel, W, H, "color")
pid, dep, pay = jax.block_until_ready((pid, dep, pay))
print("N =", pid.shape[0], flush=True)
SIZE = W * H

cases = {
    "sort_nk1": lambda p, d, y: jax.lax.sort([p.astype(jnp.uint32), d, y], num_keys=1, is_stable=False),
    "sort_nk3": lambda p, d, y: jax.lax.sort([p.astype(jnp.uint32), d, y], num_keys=3, is_stable=False),
    "merge_v1_nodepth": None,
    "merge_v1_depth": None,
    "merge_v2": None,
}

def slope(fn, *args):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(p, d, y, k):
        acc = jnp.uint32(0)
        for _ in range(k):
            outs = fn(p, d, y)
            probe = outs[0].reshape(-1)[0].astype(jnp.uint32)
            bump = jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(jnp.uint32)
            p = p + bump
            acc += probe
        return acc
    ts = {}
    for k in (1, 4):
        float(chain(*args, k=k))
        t0 = time.perf_counter(); float(chain(*args, k=k)); ts[k] = time.perf_counter() - t0
    return (ts[4] - ts[1]) / 3 * 1e3

spid, sdep, spay = jax.lax.sort([pid.astype(jnp.uint32), dep, pay], num_keys=3, is_stable=False)
spid, sdep, spay = jax.block_until_ready((spid, sdep, spay))

print(f"sort_nk1 : {slope(cases['sort_nk1'], pid, dep, pay):7.2f} ms", flush=True)
print(f"sort_nk3 : {slope(cases['sort_nk3'], pid, dep, pay):7.2f} ms", flush=True)
print(f"merge_v1 nodepth: {slope(lambda p,d,y: [dense_from_sorted(p,d,y,SIZE,False)[1]], spid, sdep, spay):7.2f} ms", flush=True)
print(f"merge_v1 depth  : {slope(lambda p,d,y: [dense_from_sorted(p,d,y,SIZE,True)[1]], spid, sdep, spay):7.2f} ms", flush=True)
print(f"merge_v2        : {slope(lambda p,d,y: [dense_from_sorted_nk1(p,d,y,SIZE,True)[1]], spid, sdep, spay):7.2f} ms", flush=True)
