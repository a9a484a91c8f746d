"""Batch-level encode/decode round trips (preprocess <-> GPU-decoder semantics)."""

import numpy as np

from pcrhpg24_tpu.codec.batch_codec import (
    decode_batch,
    deltas_to_coords,
    encode_batch,
)
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.constants import POINTS_PER_WORKGROUP


def synthetic_cloud(rng, n):
    """Clustered walk resembling a lidar tile (mostly small deltas)."""
    steps = rng.integers(-60, 60, size=(n, 3))
    jumps = rng.integers(-500000, 500000, size=(n, 3)) * (rng.random((n, 1)) < 0.001)
    pts = np.cumsum(steps + jumps, axis=0).astype(np.int32)
    return pts[:, 0], pts[:, 1], pts[:, 2]


def test_batch_roundtrip_exact():
    rng = np.random.default_rng(42)
    n = POINTS_PER_WORKGROUP
    x, y, z = synthetic_cloud(rng, n)
    order = morton_order(x, y, z)
    x, y, z = x[order], y[order], z[order]

    eb = encode_batch(x, y, z)
    deltas = decode_batch(
        eb.encoding,
        eb.cluster_sizes,
        eb.separate,
        eb.separate_sizes,
        eb.decoder_values,
        eb.decoder_cw_len,
    )
    coords = deltas_to_coords(deltas, eb.start_values)
    np.testing.assert_array_equal(coords[:, 0], x)
    np.testing.assert_array_equal(coords[:, 1], y)
    np.testing.assert_array_equal(coords[:, 2], z)

    comp_bytes = 4 * (len(eb.encoding) + len(eb.separate)) + 4 * 2 * 4096 + 4 * 32 + 12 * 1024
    ratio = (12 * n) / comp_bytes
    print(f"geometry compression ratio: {ratio:.2f}")
    assert ratio > 1.5


def test_batch_random_worstcase():
    """Pure random coords: heavy escapes; roundtrip must still be exact."""
    rng = np.random.default_rng(1)
    n = POINTS_PER_WORKGROUP
    x = rng.integers(-(2**28), 2**28, n).astype(np.int32)
    y = rng.integers(-(2**28), 2**28, n).astype(np.int32)
    z = rng.integers(-(2**28), 2**28, n).astype(np.int32)
    eb = encode_batch(x, y, z)
    deltas = decode_batch(
        eb.encoding, eb.cluster_sizes, eb.separate, eb.separate_sizes,
        eb.decoder_values, eb.decoder_cw_len,
    )
    coords = deltas_to_coords(deltas, eb.start_values)
    np.testing.assert_array_equal(coords, np.stack([x, y, z], axis=1))
