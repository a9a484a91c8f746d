"""Pallas tbatch decoder vs the NumPy protocol mirror (interpret mode).

Bit-exactness on real TPU hardware is additionally checked by
tpu_checks/check_pallas.py (the CPU suite runs the kernel interpreter).
"""

import numpy as np
import jax.numpy as jnp

from pcrhpg24_tpu.codec.native import decode_native_batch, encode_native_batch
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.render.pallas_decode import decode_native_batches, pack_native_batches


def _cloud(seed):
    rng = np.random.default_rng(seed)
    n = 65536
    steps = rng.integers(-80, 80, size=(n, 3))
    steps += rng.integers(-(2**24), 2**24, size=(n, 3)) * (rng.random((n, 1)) < 0.005)
    pts = np.cumsum(steps, axis=0, dtype=np.int64)
    pts = ((pts + 2**31) % 2**32 - 2**31).astype(np.int32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    o = morton_order(x, y, z)
    return x[o], y[o], z[o]


def test_pallas_decode_interpret_bit_exact():
    clouds = [_cloud(s) for s in (0, 1)]
    nbs = [encode_native_batch(x, y, z) for x, y, z in clouds]
    packed = pack_native_batches(nbs)

    out = np.asarray(
        decode_native_batches(
            jnp.asarray(packed["lj"]),
            jnp.asarray(packed["streams"]),
            jnp.asarray(packed["ptrs"]),
            jnp.asarray(packed["dD"]),
            jnp.asarray(packed["lut"]),
            jnp.asarray(packed["starts"]),
            interpret=True,
        )
    )  # (B, 64, 3, 8, 128)

    for b, (nb, (x, y, z)) in enumerate(zip(nbs, clouds)):
        want = decode_native_batch(nb)  # (65536, 3), lane-major
        np.testing.assert_array_equal(want[:, 0], x)
        # kernel layout (point, comp, group, lane) -> lane-major points
        got = np.transpose(out[b], (2, 3, 0, 1)).reshape(-1, 3)
        np.testing.assert_array_equal(got, want, err_msg=f"batch {b}")
