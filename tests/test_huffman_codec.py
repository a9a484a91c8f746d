"""Codec round-trip tests, modelled on the reference's test_huffman

(reference: src/test_huffman.cpp:16-63 — random data -> pjn dict/table ->
compress -> decompress -> assert equality)."""

import numpy as np
import pytest

from pcrhpg24_tpu.codec.huffman import (
    PjnDictionary,
    build_pjn_dictionary,
    decode_stream,
    encode_stream,
)
from pcrhpg24_tpu.codec.warp_interleave import decode_warp, interleave_warp
from pcrhpg24_tpu.constants import MAX_CW_LEN, WARP_SIZE


def geometric_deltas(rng, n, scale=8.0):
    """Delta-like distribution: mostly small, heavy tail."""
    mag = rng.geometric(1.0 / scale, size=n).astype(np.int64)
    sign = rng.choice([-1, 1], size=n)
    return (mag * sign).astype(np.int32)


@pytest.mark.parametrize("n", [10, 1000, 20000])
def test_roundtrip_stream(n):
    rng = np.random.default_rng(n)
    data = geometric_deltas(rng, n)
    d = build_pjn_dictionary(data)
    tv, tl = d.table()
    words, separate, num_cw = encode_stream(data, d)
    assert len(words) == len(num_cw)
    out = decode_stream(words, separate, tv, tl, n)
    np.testing.assert_array_equal(out, data)


def test_roundtrip_heavy_tail_has_escapes():
    rng = np.random.default_rng(7)
    data = np.concatenate(
        [geometric_deltas(rng, 50000, 2.0), rng.integers(-(2**20), 2**20, 5000)]
    ).astype(np.int32)
    rng.shuffle(data)
    d = build_pjn_dictionary(data)
    assert any(l < 0 for _, l in d.codes.values()), "expected escape codes"
    tv, tl = d.table()
    words, separate, _ = encode_stream(data, d)
    assert len(separate) > 0
    out = decode_stream(words, separate, tv, tl, len(data))
    np.testing.assert_array_equal(out, data)


def test_table_lengths_bounded():
    rng = np.random.default_rng(3)
    data = geometric_deltas(rng, 30000, 30.0)
    d = build_pjn_dictionary(data)
    tv, tl = d.table()
    assert tl.shape == (4096,)
    assert (np.abs(tl) <= MAX_CW_LEN).all()
    assert (tl != 0).all()


def test_single_symbol_stream():
    data = np.zeros(500, np.int32)
    d = build_pjn_dictionary(data)
    tv, tl = d.table()
    words, separate, _ = encode_stream(data, d)
    out = decode_stream(words, separate, tv, tl, 500)
    np.testing.assert_array_equal(out, data)


def test_warp_interleave_roundtrip():
    """32 lanes with unequal stream lengths -> interleave -> warp decode."""
    rng = np.random.default_rng(11)
    sym_per_lane = 192  # 64 points * 3 deltas
    lanes = [geometric_deltas(rng, sym_per_lane, 4.0 + t % 7) for t in range(WARP_SIZE)]
    alldata = np.concatenate(lanes)
    d = build_pjn_dictionary(alldata)
    tv, tl = d.table()

    words_pl, numcw_pl, seps = [], [], []
    for t in range(WARP_SIZE):
        w, s, c = encode_stream(lanes[t], d)
        words_pl.append(w)
        numcw_pl.append(c)
        seps.append(s)
    bits_pl = [np.abs([d.codes[int(s)][1] for s in lanes[t]]).astype(np.int64) for t in range(WARP_SIZE)]
    packed = interleave_warp(words_pl, numcw_pl, bits_pl)
    # protocol-exact interleave adds 1-2 dummy words per lane for the
    # GPU's phantom lookahead refills
    real = sum(len(w) for w in words_pl)
    assert real <= len(packed) <= real + 2 * WARP_SIZE

    sep_offsets = np.concatenate([[0], np.cumsum([len(s) for s in seps])[:-1]])
    separate = (
        np.concatenate(seps) if any(len(s) for s in seps) else np.zeros(1, np.int32)
    )
    out = decode_warp(packed, separate, sep_offsets, tv, tl, sym_per_lane)
    for t in range(WARP_SIZE):
        np.testing.assert_array_equal(out[t], lanes[t], err_msg=f"lane {t}")
