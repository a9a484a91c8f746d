"""Stage attribution for the merge-kernel frame (post-a1bda06)."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu, render_chunk_native, CHUNK
from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted
from pcrhpg24_tpu.render.camera import frame_setup_device

Debug.lod = 1.0
las = NativeLasData.create("out/bench_64.tpc")
r = Renderer(1920, 1080)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r); las.wait_loaded(r)
r.controls_update()
cam = r.camera
fp = np.zeros(40, np.float32)
fp[0:16] = cam.view().astype(np.float32).reshape(-1)
fp[16:22] = cam.proj_params().astype(np.float32)
fp[22] = 1.0; fp[23] = float(las.num_batches_loaded)
fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
fpd = jnp.asarray(fp)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
W, H = 1920, 1080

def frame(stage, dev, frame_params, scale, offset_rel):
    view = frame_params[0:16].reshape(4, 4)
    lod_n = frame_setup_device(view, frame_params[16:22], dev["bbox_min"], dev["bbox_max"],
                               frame_params[23].astype(jnp.int32), W, H, frame_params[22], True)
    transform = frame_params[24:40].reshape(4, 4)
    size = W * H
    pid, dep, pay = render_chunk_native(dev, 0, transform, lod_n, scale, offset_rel,
                                        W, H, "color", True, 64)
    if stage == "planes":
        return (pid[0] + dep[0] + pay[0]).astype(jnp.uint32)
    spid, sdep, spay = jax.lax.sort([pid.astype(jnp.uint32), dep, pay], num_keys=3, is_stable=False)
    if stage == "sort":
        return spid[0] + sdep[0] + spay[0]
    fd, fpb = dense_from_sorted(spid, sdep, spay, size, False)
    return fpb[0]

for stage in ("sort", "full"):
    f = jax.jit(functools.partial(frame, stage))
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(fpd, scale, offset_rel, k, f=f):
        acc = jnp.uint32(0); p0 = fpd
        for _ in range(k):
            probe = f(las.dev, p0, scale, offset_rel)
            p0 = fpd + jnp.where(probe == jnp.uint32(1), 1.0, 0.0)
            acc += probe
        return acc
    ts = {}
    for k in (1, 3):
        float(chain(fpd, scale, offset_rel, k=k))
        t0 = time.perf_counter(); float(chain(fpd, scale, offset_rel, k=k)); ts[k] = time.perf_counter() - t0
    print(f"through {stage:7s}: {(ts[3]-ts[1])/2*1e3:7.2f} ms", flush=True)
