"""wg format: pack/unpack roundtrip, converter, and method render."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.formats.potree import build_potree
from pcrhpg24_tpu.render.methods.loop_nodes_compressed import (
    ComputeLoopNodesCompressed,
    WgData,
)
from pcrhpg24_tpu.tools.potree_to_wg import convert, pack_bits, read_wg, unpack_bits
from pcrhpg24_tpu.utils.synthetic import terrain_cloud


@pytest.mark.parametrize("bits", [1, 7, 13, 30])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(bits)
    vals = rng.integers(0, 1 << bits, size=(777, 3)).astype(np.uint32)
    words = pack_bits(vals, bits)
    out = unpack_bits(words, bits, 777)
    np.testing.assert_array_equal(out, vals)


@pytest.fixture(scope="module")
def wg_path(tmp_path_factory):
    xyz, rgb = terrain_cloud(60_000, seed=70, extent=300.0)
    d = tmp_path_factory.mktemp("wg")
    pd = str(d / "potree")
    build_potree(pd, xyz, rgb)
    out = str(d / "cloud.wg")
    convert(pd, out, precision=0.001)
    return out


def test_wg_quantization_error(wg_path):
    records, words, colors = read_wg(wg_path)
    npts, bits, woff, coff, bmin, bmax = records[0]
    q = unpack_bits(words[woff:], bits, npts)
    span = float((bmax - bmin).max())
    pts = q.astype(np.float64) / (1 << bits) * span + bmin
    # within one quantization step of the node box
    assert (pts >= bmin - 1e-6).all() and (pts <= bmax + span / (1 << bits) + 1e-6).all()


def test_wg_method_renders(wg_path):
    r = Renderer(192, 108)
    r.apply_setting(Setting(yaw=0.4, pitch=-0.8, radius=500.0, target=(150, 150, 60)))
    wg = WgData.create(wg_path)
    m = ComputeLoopNodesCompressed(r, wg)
    img = np.asarray(r.loop(m.update, m.render, frames=1))
    assert (img != 0x00443322).mean() > 0.02
