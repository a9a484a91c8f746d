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
    assert "huffman_tpu" in out  # load-time fast path registered
    # conversion happens at load time now — nothing written next to
    # the scene (the reference's 4.1B scene would need no sidecar)
    assert not os.path.exists(huf + ".tpc")


def test_viewer_serves_frames(tpc_scene):
    """The localhost viewer serves the page, /info, and rendered PNGs
    with live camera/mode parameters (VERDICT 'interactive viewing')."""
    import json
    import threading
    import urllib.request

    from pcrhpg24_tpu.app import build_methods
    from pcrhpg24_tpu.engine.method import Runtime
    from pcrhpg24_tpu.engine.renderer import Renderer, Setting
    from pcrhpg24_tpu.engine.viewer import ViewerServer

    Runtime.resource = None
    r = Renderer(160, 90)
    r.apply_setting(Setting(yaw=0.7, pitch=-0.7, radius=800.0,
                            target=(200, 200, 50)))
    methods = build_methods(r, tpc_scene)
    m = methods[0]
    m.update(r)
    m.las.wait_loaded(r)

    srv = ViewerServer(r, methods, port=18734)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    import time

    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            page = urllib.request.urlopen(
                "http://127.0.0.1:18734/", timeout=5).read()
            break
        except OSError:
            time.sleep(0.2)
    assert b"pcrhpg24-tpu viewer" in page
    info = json.loads(urllib.request.urlopen(
        "http://127.0.0.1:18734/info", timeout=10).read())
    assert info["methods"]
    def fetch(mode):
        # follow the pipeline's x-stale convergence like the page does:
        # a lagged frame is re-requested until the served frame matches
        # the requested parameters
        url = ("http://127.0.0.1:18734/frame?yaw=0.8&pitch=-0.6&radius=700"
               f"&method=0&mode={mode}")
        for _ in range(3):
            resp = urllib.request.urlopen(url, timeout=60)
            body = resp.read()
            if resp.headers.get("x-stale") != "1":
                return body
        raise AssertionError("stale frames never converged")

    png = fetch("")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    png2 = fetch("overdraw")
    assert png2[:8] == b"\x89PNG\r\n\x1a\n"
    assert png2 != png  # overdraw heatmap differs from color
    srv.shutdown()
