"""HQS frame time on the bench scene (scatter-free suffix-sum kernel)."""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu_hqs import HuffmanTpuHqs, hqs_frame_native
from pcrhpg24_tpu.render.methods.huffman_tpu import CHUNK
from pcrhpg24_tpu.render.camera import batch_translations

import os
W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
SKIP_EXACT = os.environ.get("SKIP_EXACT", "0") == "1"
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0, target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpuHqs(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
img = r.loop(m.update, m.render, frames=1)
print("HQS image nonzero:", bool((np.asarray(img) != 0x443322).any()), flush=True)

cam = r.camera
fp = np.zeros(40, np.float32)
fp[0:16] = cam.view().astype(np.float32).reshape(-1)
fp[16:22] = cam.proj_params().astype(np.float32)
fp[22] = 1.0
fp[23] = float(las.num_batches_loaded)
fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
fpd = jnp.asarray(fp)
scale, offset_rel = (jnp.asarray(las.scale, jnp.float32),
                     jnp.asarray(las.offset - las.las_min, jnp.float32))
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
nch = (las.num_batches_loaded + CHUNK - 1) // CHUNK

# hqs_frame_native is two jit programs by design (compile-size limit);
# chain at the Python level with a value dependency so the k frames
# execute back-to-back on device
def chain(fp, k):
    img = None
    for _ in range(k):
        _fbd, _accn, img = hqs_frame_native(
            las.dev, fp, scale, offset_rel, W, H, nch, True, True,
            "fixed", tb)
        probe = img[0, 0]
        fp = fp + jnp.where(probe == jnp.uint32(123456789), 1.0, 0.0)
    return int(jax.block_until_ready(img)[0, 0])

ts = {}
for k in (1, 3):
    chain(fpd, k)
    t0 = time.perf_counter(); chain(fpd, k); ts[k] = time.perf_counter() - t0
print(f"HQS device frame: {(ts[3]-ts[1])/2*1e3:.2f} ms "
      f"({las.num_batches_loaded} batches)", flush=True)

# real-TPU exactness of the HQS accumulation vs the XLA scatter path
if SKIP_EXACT:
    sys.exit(0)
fbd2, accn2, img2 = hqs_frame_native(
    las.dev, fpd, scale, offset_rel, W, H, nch, True, True, "fixed", tb)
fbd_ref, accn_ref, img_ref = hqs_frame_native(
    las.dev, fpd, scale, offset_rel, W, H, nch, False, True, "fixed", tb)
same_img = (np.asarray(img2) == np.asarray(img_ref)).mean()
same_n = (np.asarray(accn2) == np.asarray(accn_ref)).mean()
print(f"TPU HQS vs XLA scatter: img agree {same_img:.6f}, "
      f"counts agree {same_n:.6f}", flush=True)
