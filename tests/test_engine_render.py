"""End-to-end engine test: .huffman scene -> flagship method -> image.

Ground truth: decode every batch with the NumPy codec, color via the
BC1 decoder, rasterize the raw points with the same camera through the
single-shot rasterizer.  The engine's chunked decode+merge pipeline must
produce the identical framebuffer.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcrhpg24_tpu.codec.batch_codec import decode_batch, deltas_to_coords
from pcrhpg24_tpu.codec.bc1 import decode_bc1
from pcrhpg24_tpu.constants import POINTS_PER_WORKGROUP
from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.resource import HuffmanLasData
from pcrhpg24_tpu.formats.huffman_file import read_batch, read_file_header
from pcrhpg24_tpu.formats.las import write_las
from pcrhpg24_tpu.preprocess import preprocess_las
from pcrhpg24_tpu.render.methods.huffman_mem_iter import HuffmanMemIter
from pcrhpg24_tpu.render.raster import rasterize, resolve
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

W, H = 320, 180


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    xyz, rgb = terrain_cloud(200_000, seed=5, extent=1000.0)
    grid = cloud_to_grid(xyz)
    d = tmp_path_factory.mktemp("scene")
    las = str(d / "s.las")
    out = str(d / "s.huffman")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las(las, out, sort=True, verbose=False)
    return out


def make_renderer():
    r = Renderer(W, H)
    r.apply_setting(
        Setting(yaw=0.5, pitch=-0.8, radius=900.0, target=(500.0, 500.0, 100.0))
    )
    return r


def test_engine_matches_ground_truth(scene):
    Debug.lod = 1.0  # full decode so ground truth covers every point
    las = HuffmanLasData.create(scene)
    r = make_renderer()
    method = HuffmanMemIter(r, las)
    method.update(r)
    las.wait_loaded(r)
    img = r.loop(method.update, method.render, frames=1)
    img = np.asarray(img)
    fb_d, fb_p = (np.asarray(a) for a in r.last_fb)

    # ground truth from the CPU codec
    hdr = read_file_header(scene)
    pos_all, col_all = [], []
    for i in range(hdr.num_batches):
        b = read_batch(scene, hdr, i)
        deltas = decode_batch(
            b.encoding, b.cluster_sizes, b.separate, b.separate_sizes,
            b.decoder_values, b.decoder_cw_len,
        )
        coords = deltas_to_coords(deltas, b.start_values)
        pos = coords.astype(np.float32) * np.float32(b.las_scale) + np.float32(
            b.las_offset - b.las_min.astype(np.float64)
        )
        pos_all.append(pos.astype(np.float32))
        col_all.append(decode_bc1(b.color, np.arange(POINTS_PER_WORKGROUP)))
    pos_all = np.concatenate(pos_all)
    col_all = np.concatenate(col_all).astype(np.uint32)

    view = r.camera.view()
    proj = r.camera.proj()
    t = (proj @ view).astype(np.float32)
    gt_d, gt_p = rasterize(
        jnp.asarray(pos_all), jnp.asarray(col_all), jnp.asarray(t), W, H
    )
    gt_d, gt_p = np.asarray(gt_d), np.asarray(gt_p)

    hit = gt_p != 0xFFFFFFFF
    assert hit.sum() > 2000, "scene not visible"
    # cross-program f32 FMA contraction differs between backends/programs;
    # scatter semantics are asserted bit-exactly in test_raster
    from tests.fbcompare import assert_fb_close

    assert_fb_close(fb_d, fb_p, gt_d, gt_p)
    gt_img = np.asarray(resolve(jnp.asarray(gt_p), W, H))
    assert (img == gt_img).mean() > 0.995


def test_engine_lod_reduces_points(scene):
    Debug.lod = 0.1
    las = HuffmanLasData.create(scene)
    r = make_renderer()
    r.controls.radius = 5000.0  # zoomed out -> small pixelSize -> low LOD
    method = HuffmanMemIter(r, las)
    method.update(r)
    las.wait_loaded(r)
    r.controls_update()
    wvp, lod = method.frame_setup(r)
    assert lod.max() <= 64
    assert 0 < lod[lod > 0].min() < 64  # actually reduced
    img = r.loop(method.update, method.render, frames=1)
    assert img is not None
    Debug.lod = 0.1


def test_colorize_chunks_mode(scene):
    Debug.colorize_chunks = True
    try:
        las = HuffmanLasData.create(scene)
        r = make_renderer()
        method = HuffmanMemIter(r, las)
        method.update(r)
        las.wait_loaded(r)
        img = np.asarray(r.loop(method.update, method.render, frames=1))
        fg = img[img != 0x00443322]
        assert len(np.unique(fg)) >= 2  # multiple batches visible
    finally:
        Debug.colorize_chunks = False


def test_bounding_box_overlay(scene):
    Debug.show_bounding_box = True
    try:
        las = HuffmanLasData.create(scene)
        r = make_renderer()
        method = HuffmanMemIter(r, las)
        method.update(r)
        las.wait_loaded(r)
        img = np.asarray(r.loop(method.update, method.render, frames=1))
        assert (img == 0x0000FFFF).sum() > 50  # box lines present
    finally:
        Debug.show_bounding_box = False
