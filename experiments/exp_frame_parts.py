"""Stub out frame stages to attribute the 51ms device frame."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu, _slice_rows, CHUNK
from pcrhpg24_tpu.render.pallas_decode import decode_native_batches
from pcrhpg24_tpu.render.bc1_layout import bc1_payload_native
from pcrhpg24_tpu.render.raster import EMPTY, sorted_scatter_u64_min
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
    fb_d = jnp.full((size,), EMPTY, jnp.uint32)
    fb_p = jnp.full((size,), EMPTY, jnp.uint32)
    coords = decode_native_batches(
        _slice_rows(dev["lj"], 0, CHUNK), _slice_rows(dev["streams"], 0, CHUNK),
        _slice_rows(dev["ptrs"], 0, CHUNK), _slice_rows(dev["dD"], 0, CHUNK),
        _slice_rows(dev["lut"], 0, CHUNK), _slice_rows(dev["starts"], 0, CHUNK))
    if stage == "decode":
        return fb_d, fb_p, coords.reshape(-1)[0]
    colors = _slice_rows(dev["colors"], 0, CHUNK)
    n_chunk = _slice_rows(lod_n, 0, CHUNK)
    xs = coords[:, :, 0].astype(jnp.float32) * scale[0] + offset_rel[0]
    ys = coords[:, :, 1].astype(jnp.float32) * scale[1] + offset_rel[1]
    zs = coords[:, :, 2].astype(jnp.float32) * scale[2] + offset_rel[2]
    t = transform.astype(jnp.float32)
    cx = t[0, 0]*xs + t[0, 1]*ys + t[0, 2]*zs + t[0, 3]
    cy = t[1, 0]*xs + t[1, 1]*ys + t[1, 2]*zs + t[1, 3]
    w = t[3, 0]*xs + t[3, 1]*ys + t[3, 2]*zs + t[3, 3]
    ndc_x, ndc_y = cx/w, cy/w
    shp = xs.shape
    pt_idx = jnp.arange(64, dtype=jnp.int32)
    mask = jnp.broadcast_to(pt_idx[None, :, None, None] < n_chunk[:, None, None, None], shp)
    ok = mask & (w > 0) & (jnp.abs(ndc_x) <= 1) & (jnp.abs(ndc_y) <= 1)
    sx = ((ndc_x*0.5+0.5)*W).astype(jnp.int32); sy = ((ndc_y*0.5+0.5)*H).astype(jnp.int32)
    ok &= (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    pid = jnp.where(ok, sx + sy*W, size)
    depth = jax.lax.bitcast_convert_type(w, jnp.uint32)
    if stage == "project":
        return fb_d, fb_p, pid.reshape(-1)[0] + depth.reshape(-1)[0]
    payload = bc1_payload_native(colors, shp, 64).astype(jnp.uint32)
    if stage == "bc1":
        return fb_d, fb_p, payload.reshape(-1)[0] + pid.reshape(-1)[0]
    fb_d, fb_p = sorted_scatter_u64_min(pid.reshape(-1), depth.reshape(-1), payload.reshape(-1), size, fb_d, fb_p)
    return fb_d, fb_p, fb_p[0]

for stage in ("decode", "project", "bc1", "full"):
    f = jax.jit(functools.partial(frame, stage))
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(fpd, scale, offset_rel, k, f=f):
        acc = jnp.uint32(0); p0 = fpd
        for _ in range(k):
            _a, _b, probe = f(las.dev, p0, scale, offset_rel)
            p0 = fpd + jnp.where(probe.astype(jnp.uint32) == jnp.uint32(1), 1.0, 0.0)
            acc += probe.astype(jnp.uint32)
        return acc
    ts = {}
    for k in (1, 7):
        o = chain(fpd, scale, offset_rel, k=k); float(o)
        t0 = time.perf_counter(); o = chain(fpd, scale, offset_rel, k=k); float(o)
        ts[k] = time.perf_counter() - t0
    per = (ts[7]-ts[1])/6
    print(f"through {stage:8s}: {per*1e3:7.2f} ms")
