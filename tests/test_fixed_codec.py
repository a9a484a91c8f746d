"""fbatch fixed-width codec (`.tpc` v2): round-trip + Pallas kernel
bit-exactness vs the NumPy mirror decoder."""

import numpy as np
import pytest

from pcrhpg24_tpu.codec.fixed import (
    FixedBatch,
    decode_fixed_batch,
    encode_fixed_batch,
)


def _cloud(seed=0, jumps=True):
    rng = np.random.default_rng(seed)
    base = np.cumsum(rng.integers(-20, 21, (65536, 3)), axis=0)
    if jumps:
        base[::7777] += rng.integers(-100000, 100000, (9, 3))
    return (base[:, i].astype(np.int32) for i in range(3))


def test_roundtrip_exact():
    x, y, z = _cloud(0)
    fb = encode_fixed_batch(x, y, z)
    np.testing.assert_array_equal(
        decode_fixed_batch(fb), np.stack([x, y, z], -1)
    )


def test_roundtrip_fullrange_and_constant():
    rng = np.random.default_rng(1)
    x = rng.integers(-(2**31), 2**31, 65536).astype(np.int32)
    y = rng.integers(-(2**31), 2**31, 65536).astype(np.int32)
    fb = encode_fixed_batch(x, y, x)  # W == 96 worst case
    np.testing.assert_array_equal(decode_fixed_batch(fb), np.stack([x, y, x], -1))
    c = np.full(65536, -7, np.int32)
    fb2 = encode_fixed_batch(c, c, c)
    assert fb2.total_words == 0  # zero-width chains cost nothing
    np.testing.assert_array_equal(decode_fixed_batch(fb2), np.stack([c, c, c], -1))


@pytest.mark.parametrize("points", [64, 16])
def test_pallas_kernel_matches_mirror(points):
    from pcrhpg24_tpu.render.pallas_decode_fixed import (
        decode_fixed_batches,
        pack_fixed_batches,
    )

    fbs = [encode_fixed_batch(*_cloud(s)) for s in (0, 3)]
    packed = pack_fixed_batches(fbs)
    out = decode_fixed_batches(
        packed["widths"], packed["streams"], packed["ptrs"],
        packed["starts"], interpret=True, points=points,
    )  # (B, points, 3, 8, 128)
    out = np.asarray(out)
    for b, fb in enumerate(fbs):
        ref = decode_fixed_batch(fb).reshape(8, 128, 64, 3)
        got = np.transpose(out[b], (2, 3, 0, 1))  # (8,128,points,3)
        np.testing.assert_array_equal(got, ref[:, :, :points])
