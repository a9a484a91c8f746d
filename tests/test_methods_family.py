"""Cross-method consistency on the shared scene.

The decompressed flagship, the 10-10-10 path, the basic path and the
2021 baselines all render the same cloud — images must agree where the
formats' precision allows (basic/2021 are lossless in geometry and must
match each other; 10-10-10 at level 0 is near-lossless).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.las_resources import (
    ComputeLasData,
    ComputeLasDataBasic,
    LasStandardData,
)
from pcrhpg24_tpu.engine.method import Runtime
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.formats.las import write_las
from pcrhpg24_tpu.render.methods.basic import BasicMethod
from pcrhpg24_tpu.render.methods.compute_2021 import Compute2021, Compute2021Hqs
from pcrhpg24_tpu.render.methods.loop_las import ComputeLoopLas, ComputeLoopLasHqs
from pcrhpg24_tpu.render.methods.parametric import Parametric
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

W, H = 192, 108
BG = 0x00443322


@pytest.fixture(scope="module")
def las_path(tmp_path_factory):
    xyz, rgb = terrain_cloud(120_000, seed=33, extent=600.0)
    grid = cloud_to_grid(xyz)
    p = tmp_path_factory.mktemp("fam") / "f.las"
    write_las(str(p), grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    return str(p)


def run(method_cls, data_cls, path):
    Runtime.resource = None
    r = Renderer(W, H)
    r.apply_setting(Setting(yaw=0.3, pitch=-0.8, radius=600.0, target=(300, 300, 100)))
    data = data_cls.create(path)
    m = method_cls(r, data)
    m.update(r)
    data.wait_loaded(r)
    img = np.asarray(r.loop(m.update, m.render, frames=1))
    data.unload(r)
    return img


def test_basic_matches_2021(las_path):
    img_a = run(BasicMethod, ComputeLasDataBasic, las_path)
    img_b = run(Compute2021, LasStandardData, las_path)
    # geometry identical (both exact f32 of same coords); index payloads
    # identical; pixel-level agreement should be near-total
    assert (img_a != BG).mean() > 0.03
    agree = (img_a == img_b).mean()
    assert agree > 0.995, f"basic vs 2021: {agree}"


def test_loop_las_close_to_basic(las_path):
    img_a = run(BasicMethod, ComputeLasDataBasic, las_path)
    img_c = run(ComputeLoopLas, ComputeLasData, las_path)
    hit_a = img_a != BG
    hit_c = img_c != BG
    # 10-10-10 is lossy: compare coverage, not exact pixels
    both = hit_a & hit_c
    assert both.sum() / max(hit_a.sum(), 1) > 0.85


def test_2021_hqs_runs(las_path):
    img = run(Compute2021Hqs, LasStandardData, las_path)
    assert (img != BG).mean() > 0.03


def test_parametric():
    r = Renderer(W, H)
    r.apply_setting(Setting(yaw=0.4, pitch=-0.5, radius=40.0, target=(0, 0, 0)))
    m = Parametric(r, "sphere")
    img = np.asarray(r.loop(m.update, m.render, frames=1))
    assert (img != BG).mean() > 0.05


def test_loop_las_hqs_runs(las_path):
    img = run(ComputeLoopLasHqs, ComputeLasData, las_path)
    assert (img != BG).mean() > 0.03
