"""Fused project kernel (pallas_project.py) vs the XLA projection.

Two comparisons:

* exact-arithmetic frame: a crafted transform whose f32 math is exact
  (powers of two, small-int coords), so XLA-CPU FMA contraction cannot
  introduce ulps — the streams must match BIT-FOR-BIT.  This pins the
  integer logic (BC1 palette, collapse, masks, sentinel, layout).
* real camera frame: XLA-CPU contracts the affine chain with FMAs while
  interpret-mode Pallas rounds per-op, so depths may differ by 1 ulp on
  a few percent of entries (boundary pixels may flip).  The comparison
  is ulp-tolerant here; TPU bit-identity of the full pipeline is
  asserted by bench.py's resolve gate (and experiments/r3_div_parity.py
  shows Mosaic==XLA arithmetic on TPU, 0 mismatches).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcrhpg24_tpu.formats.las import write_las
from pcrhpg24_tpu.formats.native_file import read_tpc_batch, read_tpc_header
from pcrhpg24_tpu.preprocess import preprocess_las_tpc
from pcrhpg24_tpu.render.camera import Camera, OrbitControls, batch_translations
from pcrhpg24_tpu.render.methods.huffman_tpu import render_chunk_native
from pcrhpg24_tpu.render.pallas_decode_fixed import pack_fixed_batches
from pcrhpg24_tpu.render.pallas_project import colors_kernel_layout
from pcrhpg24_tpu.render.raster import swizzle_dims
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

W, H = 320, 180
SWZ = swizzle_dims(W, H)[2]  # the stream sentinel id space


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    xyz, rgb = terrain_cloud(130_000, seed=11, extent=600.0)
    grid = cloud_to_grid(xyz)
    d = tmp_path_factory.mktemp("proj")
    las = str(d / "s.las")
    tpc = str(d / "s.tpc")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las_tpc(las, tpc, sort=True, verbose=False)

    hdr = read_tpc_header(tpc)
    items = [read_tpc_batch(tpc, hdr, i) for i in range(hdr.num_batches)]
    nbs = [nb for nb, _c in items]
    packed = pack_fixed_batches(nbs)
    colors = np.stack([c for _nb, c in items]).astype(np.uint32)
    anchors = np.stack([
        np.asarray(nb.start_values).reshape(-1, 3).min(axis=0) for nb in nbs
    ]).astype(np.int64)
    dev = {k: jnp.asarray(v) for k, v in packed.items()}
    dev["colors"] = jnp.asarray(colors)
    dev["colors_k"] = jnp.asarray(colors_kernel_layout(colors))
    dev["anchor"] = jnp.asarray(anchors.astype(np.int32))
    scale = np.asarray(hdr.scale)
    offset = np.asarray(hdr.offset)
    las_min = np.asarray(hdr.las_min)
    return dev, anchors, scale, offset, las_min, hdr.num_batches


def _run_both(dev, B, transform, tb, lod_n, scale_d, offset_rel, points=64,
              chain_collapse=False):
    kw = dict(width=W, height=H, mode="color", points=points, fmt="fixed",
              tb=tb, nbatches=B)
    xla = render_chunk_native(
        dev, 0, transform, lod_n, scale_d, offset_rel,
        use_pallas=False, **kw)
    kern = render_chunk_native(
        dev, 0, transform, lod_n, scale_d, offset_rel,
        use_pallas=True, interpret=True, chain_collapse=chain_collapse, **kw)
    return [np.asarray(a).astype(np.uint32) for a in xla], \
        [np.asarray(a).astype(np.uint32) for a in kern]


def _winners(pid, dep, pay):
    """Exact per-pixel u64 (depth<<32|payload) min over a stream."""
    live = pid < SWZ
    key = (dep.astype(np.uint64) << np.uint64(32)) | pay.astype(np.uint64)
    best = {}
    for p, k in zip(pid[live], key[live]):
        if p not in best or k < best[p]:
            best[p] = k
    return best


def test_project_kernel_exact_arithmetic(scene):
    """Power-of-two transform: every f32 op exact -> bit-identical."""
    dev, anchors, scale, offset, las_min, B = scene
    t = np.zeros((4, 4), np.float32)
    t[0, 0] = 2.0 ** -19   # cx = xs * 2^-19 (exact: coords < 2^20)
    t[1, 1] = 2.0 ** -19
    t[3, 2] = 2.0 ** -19   # w = 2 + zs*2^-19 (exact: 21 mantissa bits)
    tb = np.zeros((B, 4), np.float32)
    tb[:, 3] = 2.0
    lod_n = jnp.full((B,), 64, jnp.int32)
    # scale=1 keeps xs integral in f32
    scale_d = jnp.ones((3,), jnp.float32)
    offset_rel = jnp.zeros((3,), jnp.float32)
    (px, dx, yx), (pk, dk, yk) = _run_both(
        dev, B, jnp.asarray(t), jnp.asarray(tb), lod_n, scale_d, offset_rel)
    np.testing.assert_array_equal(pk, px)
    np.testing.assert_array_equal(dk, dx)
    live = px < SWZ
    np.testing.assert_array_equal(yk[live], yx[live])
    assert live.sum() > 10_000


def test_project_kernel_lod_exact(scene):
    """LOD bucket (points=16) + per-batch lod_n masking, exact frame."""
    dev, anchors, scale, offset, las_min, B = scene
    t = np.zeros((4, 4), np.float32)
    t[0, 0] = t[1, 1] = t[3, 2] = 2.0 ** -19
    tb = np.zeros((B, 4), np.float32)
    tb[:, 3] = 2.0
    lod_n = jnp.asarray(np.minimum(np.arange(B) * 7 + 3, 16).astype(np.int32))
    scale_d = jnp.ones((3,), jnp.float32)
    offset_rel = jnp.zeros((3,), jnp.float32)
    (px, dx, yx), (pk, dk, yk) = _run_both(
        dev, B, jnp.asarray(t), jnp.asarray(tb), lod_n, scale_d, offset_rel,
        points=16)
    np.testing.assert_array_equal(pk, px)
    np.testing.assert_array_equal(dk, dx)


def test_chain_collapse_preserves_winners(scene):
    """chain_collapse retires duplicate chain heads but keeps exact
    per-pixel u64-min winners (any collapse partition preserves mins)."""
    dev, anchors, scale, offset, las_min, B = scene
    t = np.zeros((4, 4), np.float32)
    t[0, 0] = t[1, 1] = t[3, 2] = 2.0 ** -19
    tb = np.zeros((B, 4), np.float32)
    tb[:, 3] = 2.0
    lod_n = jnp.full((B,), 64, jnp.int32)
    scale_d = jnp.ones((3,), jnp.float32)
    offset_rel = jnp.zeros((3,), jnp.float32)
    (px, dx, yx), (pk, dk, yk) = _run_both(
        dev, B, jnp.asarray(t), jnp.asarray(tb), lod_n, scale_d, offset_rel,
        chain_collapse=True)
    assert (pk < SWZ).sum() <= (px < SWZ).sum()
    assert _winners(pk, dk, yk) == _winners(px, dx, yx)


def test_project_kernel_real_frame_close(scene):
    """Real orbit camera: ulp-tolerant (XLA-CPU FMA contraction)."""
    dev, anchors, scale, offset, las_min, B = scene
    cam = Camera(width=W, height=H)
    controls = OrbitControls(
        yaw=0.7, pitch=-0.7, radius=800.0,
        target=np.array([300.0, 300.0, 50.0]),
    )
    cam.world = controls.world()
    wvp = cam.proj() @ cam.view()
    tb = batch_translations(wvp, anchors, scale, offset, las_min)
    lod_n = jnp.full((B,), 64, jnp.int32)
    scale_d = jnp.asarray(scale, jnp.float32)
    offset_rel = jnp.asarray(offset - las_min, jnp.float32)
    (px, dx, yx), (pk, dk, yk) = _run_both(
        dev, B, jnp.asarray(wvp.astype(np.float32)), jnp.asarray(tb),
        lod_n, scale_d, offset_rel)
    both = (px < SWZ) & (pk < SWZ)
    either = (px < SWZ) | (pk < SWZ)
    assert either.sum() > 10_000
    # boundary flips (clip/pixel-edge crossings from 1-ulp w) are rare
    flips = (either & ~both) | (both & (px != pk))
    assert flips.sum() < 0.02 * either.sum(), (flips.sum(), either.sum())
    same = both & (px == pk)
    ulp = np.abs(dx[same].astype(np.int64) - dk[same].astype(np.int64))
    assert ulp.max() <= 2, ulp.max()
    agree = (yx[same] == yk[same]).mean()
    assert agree > 0.98, agree
