"""C++ codec core must be byte-identical to the NumPy reference impls."""

import numpy as np
import pytest

from pcrhpg24_tpu import native as ncore
from pcrhpg24_tpu.codec.batch_codec import chain_deltas, encode_batch
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.codec.native import encode_native_batch

pytestmark = pytest.mark.skipif(not ncore.available(), reason="no native lib")


def _cloud(seed):
    rng = np.random.default_rng(seed)
    n = 65536
    steps = rng.integers(-70, 70, size=(n, 3))
    steps += rng.integers(-(2**22), 2**22, size=(n, 3)) * (rng.random((n, 1)) < 0.01)
    pts = np.cumsum(steps, axis=0, dtype=np.int64)
    pts = ((pts + 2**31) % 2**32 - 2**31).astype(np.int32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    o = morton_order(x, y, z)
    return x[o], y[o], z[o]


def test_native_encoder_matches_numpy():
    x, y, z = _cloud(5)
    nb = encode_native_batch(x, y, z)  # numpy reference

    deltas, _ = chain_deltas(x, y, z)
    enc_table = nb.code.encode_table()
    codes = np.zeros(33, np.uint32)
    lens = np.zeros(33, np.int32)
    for sym, (c, l) in enc_table.items():
        codes[sym] = c
        lens[sym] = l
    maxw = max(len(s) for s in nb.streams) + 64
    out = ncore.encode_native_batch_streams(deltas, codes, lens, maxw)
    assert out is not None
    streams, ptrs = out
    for g in range(8):
        np.testing.assert_array_equal(streams[g], nb.streams[g], err_msg=f"group {g}")
    np.testing.assert_array_equal(ptrs, nb.round_ptrs)


def test_ref_encoder_matches_numpy():
    x, y, z = _cloud(9)
    eb = encode_batch(x, y, z)  # numpy reference

    from pcrhpg24_tpu.codec.huffman import build_pjn_dictionary

    deltas, _ = chain_deltas(x, y, z)
    d = build_pjn_dictionary(deltas.reshape(-1))
    keys = np.array(sorted(d.codes.keys()), np.int64)
    sym_codes = np.array([d.codes[int(k)][0] for k in keys], np.uint32)
    sym_lens = np.array([d.codes[int(k)][1] for k in keys], np.int32)

    enc, sep, sep_sizes, cluster = ncore.encode_ref_batch_streams(
        deltas, keys.astype(np.int32), sym_codes, sym_lens
    )
    np.testing.assert_array_equal(enc, eb.encoding)
    np.testing.assert_array_equal(sep, eb.separate)
    np.testing.assert_array_equal(sep_sizes, eb.separate_sizes)
    np.testing.assert_array_equal(cluster, eb.cluster_sizes)


def test_cpp_speedup():
    import time

    x, y, z = _cloud(1)
    deltas, _ = chain_deltas(x, y, z)
    nb = encode_native_batch(x, y, z)
    enc_table = nb.code.encode_table()
    codes = np.zeros(33, np.uint32)
    lens = np.zeros(33, np.int32)
    for sym, (c, l) in enc_table.items():
        codes[sym] = c
        lens[sym] = l
    maxw = max(len(s) for s in nb.streams) + 64
    t0 = time.perf_counter()
    for _ in range(3):
        ncore.encode_native_batch_streams(deltas, codes, lens, maxw)
    dt = (time.perf_counter() - t0) / 3
    # one 65k batch should encode in well under 100 ms natively
    assert dt < 0.2, f"C++ encode too slow: {dt*1e3:.1f} ms"


def test_cpp_fixed_encoder_byte_identical():
    """C++ encode_fixed_batch must equal the NumPy spec exactly."""
    import numpy as np
    import pcrhpg24_tpu.native as ncore
    import pcrhpg24_tpu.codec.fixed as F

    if not ncore.available():
        import pytest

        pytest.skip("no native lib")
    rng = np.random.default_rng(7)
    base = np.cumsum(rng.integers(-25, 26, (65536, 3)), axis=0)
    base[::5000] += rng.integers(-(2**28), 2**28, (14, 3))
    x, y, z = (base[:, i].astype(np.int32) for i in range(3))
    fb_c = F.encode_fixed_batch(x, y, z)
    avail = ncore.available
    ncore.available = lambda: False
    try:
        fb_np = F.encode_fixed_batch(x, y, z)
    finally:
        ncore.available = avail
    np.testing.assert_array_equal(fb_c.widths, fb_np.widths)
    np.testing.assert_array_equal(fb_c.round_ptrs, fb_np.round_ptrs)
    np.testing.assert_array_equal(fb_c.streams, fb_np.streams)
    np.testing.assert_array_equal(
        F.decode_fixed_batch(fb_c), np.stack([x, y, z], -1)
    )
