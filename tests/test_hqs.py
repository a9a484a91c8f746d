"""HQS method vs a naive NumPy model on the shared test scene."""

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
from pcrhpg24_tpu.render.methods.huffman_hqs import HuffmanHQS
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

W, H = 192, 108


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    xyz, rgb = terrain_cloud(140_000, seed=12, extent=800.0)
    grid = cloud_to_grid(xyz)
    d = tmp_path_factory.mktemp("hqs")
    las = str(d / "s.las")
    out = str(d / "s.huffman")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las(las, out, sort=True, verbose=False)
    return out


def test_hqs_matches_numpy_model(scene):
    Debug.lod = 1.0
    las = HuffmanLasData.create(scene)
    r = Renderer(W, H)
    r.apply_setting(Setting(yaw=0.4, pitch=-0.7, radius=700.0, target=(400, 400, 100)))
    m = HuffmanHQS(r, las)
    m.update(r)
    las.wait_loaded(r)
    img = np.asarray(r.loop(m.update, m.render, frames=1))

    # numpy model
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
    pos = np.concatenate(pos_all)
    col = np.concatenate(col_all)

    view = r.camera.view()
    proj = r.camera.proj()
    t = (proj @ view).astype(np.float32)
    h = np.concatenate([pos, np.ones((len(pos), 1), np.float32)], 1)
    clip = (h @ t.T).astype(np.float32)
    w = clip[:, 3]
    with np.errstate(all="ignore"):
        ndc = clip[:, :2] / w[:, None]
    ok = (w > 0) & (np.abs(ndc[:, 0]) <= 1) & (np.abs(ndc[:, 1]) <= 1)
    px = ((ndc[:, 0] * 0.5 + 0.5) * W).astype(np.int64)
    py = ((ndc[:, 1] * 0.5 + 0.5) * H).astype(np.int64)
    ok &= (px < W) & (py < H) & (px >= 0) & (py >= 0)
    pid = px + py * W
    dmin = np.full(W * H, np.inf, np.float32)
    np.minimum.at(dmin, pid[ok], w[ok])
    keep = ok & (w <= dmin[np.minimum(pid, W * H - 1)] * 1.01)
    accs = [np.zeros(W * H, np.uint64) for _ in range(4)]
    ch = [col & 255, (col >> 8) & 255, (col >> 16) & 255, np.ones_like(col)]
    for a, c in zip(accs, ch):
        np.add.at(a, pid[keep], c[keep].astype(np.uint64))
    cnt = np.maximum(accs[3], 1)
    want = (accs[0] // cnt) | ((accs[1] // cnt) << 8) | ((accs[2] // cnt) << 16)
    want = np.where(accs[3] > 0, want, 0x00443322).astype(np.uint32).reshape(H, W)

    hitfrac = (accs[3] > 0).mean()
    assert hitfrac > 0.05
    # f32 FMA ordering can flip a few boundary fragments; demand 99% equal
    agree = (img == want).mean()
    assert agree > 0.99, f"only {agree:.4f} pixels agree"
