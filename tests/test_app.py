"""CLI app smoke tests (the main.cpp equivalent)."""

import os

import numpy as np
import pytest

from pcrhpg24_tpu.app import main
from pcrhpg24_tpu.formats.las import write_las
from pcrhpg24_tpu.preprocess import preprocess_las_tpc
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud


@pytest.fixture(scope="module")
def tpc_scene(tmp_path_factory):
    xyz, rgb = terrain_cloud(70_000, seed=50, extent=400.0)
    grid = cloud_to_grid(xyz)
    d = tmp_path_factory.mktemp("app")
    las = str(d / "a.las")
    tpc = str(d / "a.tpc")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las_tpc(las, tpc, sort=True, verbose=False)
    return tpc


def test_list_methods(tpc_scene, capsys):
    main(["--scene", tpc_scene, "--list-methods"])
    out = capsys.readouterr().out
    assert "huffman_tpu" in out


def test_render_and_screenshot(tpc_scene, tmp_path):
    png = str(tmp_path / "frame.png")
    depth = str(tmp_path / "depth.npy")
    main([
        "--scene", tpc_scene, "--frames", "1", "--width", "160", "--height", "90",
        "--yaw", "0.4", "--pitch", "-0.8", "--radius", "400",
        "--target", "200", "200", "100", "--screenshot", png, "--depth", depth,
        "--stats", "--lod", "1.0",
    ])
    assert os.path.getsize(png) > 500
    d = np.load(depth)
    assert d.shape == (90, 160)
    assert (d > 0).sum() > 100  # depth content present


def test_huffman_scene_gets_tpu_method(tmp_path, capsys):
    from pcrhpg24_tpu.preprocess import preprocess_las

    xyz, rgb = terrain_cloud(70_000, seed=51, extent=400.0)
    grid = cloud_to_grid(xyz)
    las = str(tmp_path / "h.las")
    huf = str(tmp_path / "h.huffman")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las(las, huf, sort=True, verbose=False)
    main(["--scene", huf, "--list-methods"])
    out = capsys.readouterr().out
    assert "huffman_mem_iter" in out
    assert "huffman_tpu" in out  # sidecar transcode registered
    assert os.path.exists(huf + ".tpc")
