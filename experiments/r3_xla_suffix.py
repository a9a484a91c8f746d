"""Move the segmented suffix-min out of the merge kernel into XLA.

In-kernel, the 5-step suffix-min costs ~90 vreg-ops per window (~24%
of the kernel).  Run GLOBALLY over the sorted rows in XLA instead
(bandwidth-bound slices, ~5 x 80 MB), it is exact across window
borders too: the run HEAD carries the min of its entire run, and any
mid-run entry a later window's lower_bound hits carries a suffix-min
>= the head's value, so the per-tile u64-min across windows keeps the
head's.  Kernel then runs with suffix_steps=0.

Measures baseline vs (XLA pre-pass + suffixless kernel), exactness-
gated against the XLA scatter resolve.
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
from pcrhpg24_tpu.render import pallas_merge as pm
from pcrhpg24_tpu.render.raster import swizzle_dims, sorted_resolve_u64_min
from pcrhpg24_tpu.render.camera import batch_translations
from pcrhpg24_tpu.utils.devtime import device_ms

W, H = 1920, 1080
K = 10
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
VIEW = os.environ.get("VIEW", "orbit")
SETTINGS = {
    "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                     target=(1000.0, 1000.0, 100.0)),
    "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                       target=(1000.0, 1000.0, 60.0)),
    "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                       target=(1000.0, 1000.0, 40.0)),
}
r.apply_setting(SETTINGS[VIEW])
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offr = jnp.asarray(las.offset - las.las_min, jnp.float32)
cam = r.camera
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
wt_cols, _ht, SIZE = swizzle_dims(W, H)
lod_d = jnp.minimum(jnp.asarray(lod_full), 64).astype(jnp.int32)

pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), lod_d, scale, offr, W, H, "color",
    fmt="fixed", tb=tb)
n = pid.shape[0] // SORT_ROWS
sp, sd, sy = jax.block_until_ready(jax.lax.sort(
    [pid.reshape(SORT_ROWS, n).astype(jnp.uint32),
     dep.reshape(SORT_ROWS, n), pay.reshape(SORT_ROWS, n)],
    num_keys=1, is_stable=False, dimension=1))
_gt_d, gt_p = jax.block_until_ready(sorted_resolve_u64_min(
    pid.astype(jnp.uint32), dep, pay, SIZE, False, use_pallas=False))
gt_p = np.asarray(gt_p)


def suffix_min_rows(spv, sdv, syv, steps: int):
    """Row-wise segmented suffix-min of the (dep, pay) u64 keys."""
    d, p = sdv, syv
    for i in range(steps):
        s = 1 << i
        vp, hp = spv[:, s:], spv[:, :-s]
        vd, vy = d[:, s:], p[:, s:]
        hd, hy = d[:, :-s], p[:, :-s]
        take = (vp == hp) & ((vd < hd) | ((vd == hd) & (vy < hy)))
        d = jnp.concatenate([jnp.where(take, vd, hd), d[:, -s:]], axis=1)
        p = jnp.concatenate([jnp.where(take, vy, hy), p[:, -s:]], axis=1)
    return d, p


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


def run(label, pre_steps):
    if pre_steps is None:
        def resolve(spv, sdv, syv):
            fast_ok = pm._runs_bounded(spv, SIZE)
            _d, p = pm._dense_rows_group(
                spv, sdv, syv, SIZE, False, True, fast_ok, pm.CLIP_TILES,
                wt_cols)
            return p
    else:
        def resolve(spv, sdv, syv):
            sdm, sym = suffix_min_rows(spv, sdv, syv, pre_steps)
            _d, p = pm._dense_rows_group(
                spv, sdm, sym, SIZE, False, True, jnp.bool_(True),
                pm.CLIP_TILES, wt_cols)
            return p

    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            sdv = sd ^ (acc & jnp.uint32(1))
            acc = acc ^ sample(resolve(sp, sdv, sy))
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    got = np.asarray(jax.jit(resolve)(sp, sd, sy))
    ok = np.array_equal(got, gt_p)
    print(f"{label:24s} {ms:7.2f} ms  exact={ok}", flush=True)


run("baseline (5-step kern)", None)
save = pm.FAST_SUFFIX_STEPS
pm.FAST_SUFFIX_STEPS = 0
run("xla pre 5 + kern 0", 5)
run("xla pre 10 + kern 0", 10)
pm.FAST_SUFFIX_STEPS = save
