"""End-to-end: synthetic LAS -> preprocess -> .huffman -> decode-verify.

Models the reference's ASSERT_DECOMPRESSION check (preprocess.cpp:35,
576-581) but at full-file granularity and through the serialized format.
"""

import numpy as np
import pytest

from pcrhpg24_tpu.codec.batch_codec import decode_batch, deltas_to_coords
from pcrhpg24_tpu.codec.bc1 import decode_bc1
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.constants import POINTS_PER_WORKGROUP
from pcrhpg24_tpu.formats.huffman_file import read_batch, read_file_header
from pcrhpg24_tpu.formats.las import read_points, write_las
from pcrhpg24_tpu.preprocess import preprocess_las
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud


@pytest.fixture(scope="module")
def las_file(tmp_path_factory):
    n = 150_000  # forces padding + 3 batches
    xyz, rgb = terrain_cloud(n, seed=3)
    grid = cloud_to_grid(xyz)
    path = tmp_path_factory.mktemp("data") / "test.las"
    write_las(str(path), grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    return str(path), grid, rgb


def test_las_roundtrip(las_file):
    path, grid, rgb = las_file
    pts = read_points(path)
    assert len(pts.x) == len(grid)
    np.testing.assert_array_equal(pts.x, grid[:, 0])
    np.testing.assert_array_equal(pts.z, grid[:, 2])
    np.testing.assert_array_equal(pts.color & 0xFF, rgb[:, 0].astype(np.uint32))


def test_preprocess_and_decode(las_file, tmp_path):
    path, grid, rgb = las_file
    out = str(tmp_path / "test.huffman")
    preprocess_las(path, out, sort=True, verbose=False)

    hdr = read_file_header(out)
    n = len(grid)
    n_padded = ((n + POINTS_PER_WORKGROUP - 1) // POINTS_PER_WORKGROUP) * POINTS_PER_WORKGROUP
    assert hdr.num_points == n_padded
    assert hdr.num_batches == n_padded // POINTS_PER_WORKGROUP

    # expected order: pad-then-morton-sort
    x, y, z = grid[:, 0].copy(), grid[:, 1].copy(), grid[:, 2].copy()
    color = (
        rgb[:, 0].astype(np.uint32)
        | (rgb[:, 1].astype(np.uint32) << 8)
        | (rgb[:, 2].astype(np.uint32) << 16)
    )
    pad = n_padded - n
    x = np.concatenate([x, np.full(pad, x[-1])])
    y = np.concatenate([y, np.full(pad, y[-1])])
    z = np.concatenate([z, np.full(pad, z[-1])])
    color = np.concatenate([color, np.full(pad, color[-1])])
    order = morton_order(x, y, z)
    x, y, z, color = x[order], y[order], z[order], color[order]

    for bi in range(hdr.num_batches):
        b = read_batch(out, hdr, bi)
        deltas = decode_batch(
            b.encoding, b.cluster_sizes, b.separate, b.separate_sizes,
            b.decoder_values, b.decoder_cw_len,
        )
        coords = deltas_to_coords(deltas, b.start_values)
        sl = slice(bi * POINTS_PER_WORKGROUP, (bi + 1) * POINTS_PER_WORKGROUP)
        np.testing.assert_array_equal(coords[:, 0], x[sl], err_msg=f"batch {bi} x")
        np.testing.assert_array_equal(coords[:, 1], y[sl], err_msg=f"batch {bi} y")
        np.testing.assert_array_equal(coords[:, 2], z[sl], err_msg=f"batch {bi} z")

        # BC1 color: lossy — check mean abs error is small
        dec = decode_bc1(b.color, np.arange(POINTS_PER_WORKGROUP))
        got = np.stack([dec & 255, (dec >> 8) & 255, (dec >> 16) & 255], -1).astype(int)
        want = np.stack(
            [color[sl] & 255, (color[sl] >> 8) & 255, (color[sl] >> 16) & 255], -1
        ).astype(int)
        mae = np.abs(got - want).mean()
        assert mae < 12.0, f"batch {bi} BC1 MAE too high: {mae}"
