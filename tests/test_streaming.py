"""Progressive streaming: rendering while batches are still loading.

The reference renders whatever is loaded each frame (numBatchesLoaded
grows as the loader thread delivers, huffman_mem_iter_cuda.h:182).
"""

import numpy as np
import pytest

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.method import Runtime
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.resource import HuffmanLasData, ResourceState
from pcrhpg24_tpu.formats.las import write_las
from pcrhpg24_tpu.preprocess import preprocess_las
from pcrhpg24_tpu.render.methods.huffman_mem_iter import HuffmanMemIter
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

BG = 0x00443322


def test_progressive_render(tmp_path):
    xyz, rgb = terrain_cloud(200_000, seed=80, extent=700.0)
    grid = cloud_to_grid(xyz)
    las_p = str(tmp_path / "s.las")
    out = str(tmp_path / "s.huffman")
    write_las(las_p, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las(las_p, out, sort=True, verbose=False)

    Debug.lod = 1.0
    Runtime.resource = None
    las = HuffmanLasData.create(out)
    las.BATCHES_PER_TASK = 1  # force incremental delivery
    r = Renderer(192, 108)
    r.apply_setting(Setting(yaw=0.4, pitch=-0.8, radius=700.0, target=(350, 350, 100)))
    m = HuffmanMemIter(r, las)
    m.update(r)

    coverages = []
    for _ in range(40):
        img = np.asarray(r.loop(m.update, m.render, frames=1))
        coverages.append((img != BG).mean())
        if las.state == ResourceState.LOADED:
            break
    assert las.state == ResourceState.LOADED, "never finished loading"
    # coverage grows as batches stream in, and mid-load frames render
    assert coverages[-1] > 0.03
    # coverage must not shrink as batches stream in (when the loader is
    # slow enough for us to observe intermediate frames at all)
    assert coverages[-1] >= coverages[0]
