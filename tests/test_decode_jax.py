"""JAX decoder bit-exactness vs the NumPy batch codec on a real file."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcrhpg24_tpu.codec.batch_codec import decode_batch, deltas_to_coords
from pcrhpg24_tpu.formats.huffman_file import read_batch, read_file_header
from pcrhpg24_tpu.formats.las import write_las
from pcrhpg24_tpu.preprocess import preprocess_las
from pcrhpg24_tpu.render.decode_jax import batches_to_device, decode_batches
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud


@pytest.fixture(scope="module")
def huffman_file(tmp_path_factory):
    xyz, rgb = terrain_cloud(140_000, seed=9)
    grid = cloud_to_grid(xyz)
    d = tmp_path_factory.mktemp("dx")
    las = str(d / "t.las")
    out = str(d / "t.huffman")
    write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
    preprocess_las(las, out, sort=True, verbose=False)
    return out


def test_decode_jax_bit_exact(huffman_file):
    hdr = read_file_header(huffman_file)
    dumps = [read_batch(huffman_file, hdr, i) for i in range(hdr.num_batches)]
    dev = batches_to_device(dumps)

    coords = np.asarray(
        decode_batches(
            jnp.asarray(dev["encoding"]),
            jnp.asarray(dev["enc_offsets"]),
            jnp.asarray(dev["cluster_sizes"]),
            jnp.asarray(dev["separate"]),
            jnp.asarray(dev["sep_offsets"]),
            jnp.asarray(dev["separate_sizes"]),
            jnp.asarray(dev["table_values"]),
            jnp.asarray(dev["table_cw_len"]),
            jnp.asarray(dev["start_values"]),
        )
    )  # (B, 1024, 64, 3)

    for i, b in enumerate(dumps):
        deltas = decode_batch(
            b.encoding, b.cluster_sizes, b.separate, b.separate_sizes,
            b.decoder_values, b.decoder_cw_len,
        )
        want = deltas_to_coords(deltas, b.start_values).reshape(1024, 64, 3)
        np.testing.assert_array_equal(coords[i], want, err_msg=f"batch {i}")
