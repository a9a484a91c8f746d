"""Offline tools: sort_las (incl. frugal), crop_las, process_stats, batch_stats."""

import numpy as np
import pytest

from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.formats.las import read_points, write_las
from pcrhpg24_tpu.tools.crop_las import crop_las
from pcrhpg24_tpu.tools.process_stats import delta_bit_study
from pcrhpg24_tpu.tools.sort_las import sort_las
from pcrhpg24_tpu.utils.batch_stats import scene_stats
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud


@pytest.fixture(scope="module")
def las_path(tmp_path_factory):
    xyz, rgb = terrain_cloud(80_000, seed=60, extent=300.0)
    grid = cloud_to_grid(xyz)
    p = tmp_path_factory.mktemp("tools") / "t.las"
    write_las(str(p), grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    return str(p)


def test_sort_las_morton(las_path, tmp_path):
    out = str(tmp_path / "m.las")
    sort_las(las_path, out, "morton")
    pts = read_points(out)
    order = morton_order(pts.x, pts.y, pts.z)
    assert (order == np.arange(len(order))).all(), "output not morton sorted"


def test_sort_las_frugal_matches(las_path, tmp_path):
    a = str(tmp_path / "a.las")
    b = str(tmp_path / "b.las")
    sort_las(las_path, a, "morton", frugal=False)
    sort_las(las_path, b, "morton", frugal=True)
    pa, pb = read_points(a), read_points(b)
    np.testing.assert_array_equal(pa.x, pb.x)
    np.testing.assert_array_equal(pa.color, pb.color)


def test_crop(las_path, tmp_path):
    out = str(tmp_path / "c.las")
    crop_las(las_path, out, 1000)
    assert len(read_points(out).x) == 1000


def test_process_stats(las_path):
    rep = delta_bit_study(las_path)
    assert "bit-length histogram" in rep
    assert "mean bits/delta" in rep


def test_batch_stats(las_path, tmp_path):
    from pcrhpg24_tpu.preprocess import preprocess_las_tpc

    tpc = str(tmp_path / "s.tpc")
    preprocess_las_tpc(las_path, tpc, verbose=False)
    rep = scene_stats(tpc)
    assert "#batches: 2" in rep
    assert "geometry compression" in rep


def test_buildup_perf_strategies(tmp_path):
    """CPU octree buildup strategies (main_buildup_perf port): every
    strategy must ingest all points into the same octree shape."""
    import numpy as np

    from pcrhpg24_tpu.formats.las import write_las
    from pcrhpg24_tpu.tools.buildup_perf import get_lib, run_strategy
    from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

    xyz, rgb = terrain_cloud(300_000, seed=4, extent=500.0)
    grid = cloud_to_grid(xyz)
    las = str(tmp_path / "b.las")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    from pcrhpg24_tpu.formats.las import read_header, read_points

    hdr = read_header(las)
    pts = read_points(las, 0, hdr.num_points)
    w = np.stack([
        pts.x * hdr.scale[0] + hdr.offset[0],
        pts.y * hdr.scale[1] + hdr.offset[1],
        pts.z * hdr.scale[2] + hdr.offset[2],
    ], axis=1)
    bbox = np.concatenate([np.asarray(hdr.cmin), np.asarray(hdr.cmax) + 1e-9])
    lib = get_lib()
    rs = [run_strategy(lib, w, bbox, s, 2) for s in range(4)]
    nodes = {r["nodes"] for r in rs}
    assert len(nodes) == 1, rs  # same tree shape from every strategy
    assert all(r["mpts_per_s"] > 0 for r in rs)
