"""Golden cross-validation against the reference's OWN CPU binaries.

Until this file, ".huffman byte-compatibility" and the LASzip reader
were certified only against our own mirror implementations.  These
tests compile the reference's CPU tools (tests/golden_build.py) and
compare against what the ORIGINAL code produces:

* the reference codec self-test runs and passes in this environment;
* the reference `preprocess` binary and ours compress the same LAS
  (sort=1) and the two `.huffman` files decode to the same geometry —
  batch boundaries, Morton order, and chain start values byte-equal,
  all non-tail deltas byte-equal.  The files themselves are NOT
  byte-identical: Huffman tree tie-breaks differ (both dictionaries
  are valid; header encoding/separate byte counts differ), and the
  reference encoder under-allocates the warp streams' phantom tail
  refills (a latent defect of its interleave documented at
  codec/warp_interleave.py:37-50: the GPU window refills past a
  lane's last word, so up to the last ~2 symbols of a lane read
  neighbouring lanes' words).  The tests pin BOTH facts: equality
  everywhere else, and the divergence confined to final-point symbols.
* the vendored canonical laszip compresses a LAS to LAZ and our
  pure-Python reader (formats/laz.py) decodes it bit-exactly —
  an externally produced artifact, not a self-round-trip.
"""

import os
import subprocess

import numpy as np
import pytest

from tests.golden_build import build_golden

from pcrhpg24_tpu.formats.las import read_header, read_points, write_las
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.environ.get("PCRHPG_REFERENCE", "/root/reference")),
    reason="reference tree not mounted",
)


@pytest.fixture(scope="module")
def golden():
    out = build_golden()
    if out is None:
        pytest.skip("golden binaries could not be built")
    return out


@pytest.fixture(scope="module")
def las_path(tmp_path_factory):
    xyz, rgb = terrain_cloud(3 * 65536, seed=77, extent=800.0)
    grid = cloud_to_grid(xyz)
    p = str(tmp_path_factory.mktemp("golden") / "g.las")
    write_las(p, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    return p


def test_reference_codec_selftest(golden):
    """The reference's own `test_huffman` round-trip suite passes."""
    r = subprocess.run([golden["test_huffman"], "20000"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if "equal" in ln]
    assert lines and all(ln.strip().endswith("1") for ln in lines), r.stdout


def _decode_all(path):
    from pcrhpg24_tpu.codec.batch_codec import decode_batch, deltas_to_coords
    from pcrhpg24_tpu.formats.huffman_file import read_batch, read_file_header
    from pcrhpg24_tpu import native as ncore

    hdr = read_file_header(path)
    deltas, coords, sv = [], [], []
    for i in range(hdr.num_batches):
        b = read_batch(path, hdr, i)
        if ncore.available():
            d = ncore.decode_ref_batch_deltas(
                b.encoding, b.cluster_sizes, b.separate, b.separate_sizes,
                b.decoder_values, b.decoder_cw_len)
        else:
            d = decode_batch(
                b.encoding, b.cluster_sizes, b.separate, b.separate_sizes,
                b.decoder_values, b.decoder_cw_len)
        deltas.append(np.asarray(d))
        coords.append(deltas_to_coords(d, b.start_values))
        sv.append(np.asarray(b.start_values).reshape(-1, 3))
    return hdr, np.stack(deltas), np.concatenate(coords), np.concatenate(sv)


def test_preprocess_golden_decode_equivalence(golden, las_path, tmp_path):
    """Our preprocessor vs the reference binary on the same LAS."""
    from pcrhpg24_tpu.preprocess import preprocess_las

    ref_h = str(tmp_path / "ref.huffman")
    our_h = str(tmp_path / "ours.huffman")
    r = subprocess.run([golden["preprocess"], las_path, ref_h, "1"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    preprocess_las(las_path, our_h, sort=True, verbose=False)

    ha, da, ca, sa = _decode_all(our_h)
    hb, db, cb, sb = _decode_all(ref_h)
    assert ha.num_points == hb.num_points
    assert ha.num_batches == hb.num_batches
    # identical Morton order and chain structure: every chain's start
    # value matches byte-for-byte
    np.testing.assert_array_equal(sa, sb)

    # delta equivalence, except the reference's phantom-tail defect:
    # its encoder does not allocate the GPU window's refills past a
    # lane's final word, so a lane's LAST-point symbols can decode
    # from neighbouring lanes' words.  Everything else is byte-equal.
    diff = np.argwhere(da != db)
    syms = diff[:, 2] if len(diff) else np.zeros(0, np.int64)
    assert (syms >= 189).all(), (
        f"non-tail decode divergence at symbols {sorted(set(syms))[:8]}")
    # the defect touches isolated lanes, not the stream at large
    assert len(diff) <= 2 * 1024 * ha.num_batches * 3 // 64
    frac = (ca != cb).sum() / ca.size
    assert frac < 0.001, f"coordinate divergence fraction {frac}"


def test_laz_reader_against_reference_laszip(golden, las_path, tmp_path):
    """Canonical-laszip-encoded LAZ decodes bit-exactly in formats/laz.py."""
    from pcrhpg24_tpu.formats.laz import read_laz_points

    laz = str(tmp_path / "g.laz")
    r = subprocess.run([golden["las2laz"], las_path, laz],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.returncode, r.stderr)
    h = read_header(las_path)
    ref = read_points(las_path, 0, h.num_points)
    got = read_laz_points(laz)
    for attr in ("x", "y", "z", "color"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, attr)), np.asarray(getattr(ref, attr)),
            err_msg=attr)
