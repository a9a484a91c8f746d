"""Multi-chip sharded render == single-device render (8-dev CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from __graft_entry__ import _tiny_scene
from pcrhpg24_tpu.parallel.mesh import (
    _local_raster,
    make_multichip_render,
    shard_streams_host,
)
from pcrhpg24_tpu.render.decode_jax import decode_batches_core


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single():
    dp, sp = 4, 2
    devices = np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp)
    mesh = Mesh(devices, ("dp", "sp"))
    W, H = 128, 64 * sp
    scene = _tiny_scene(dp, seed=3)
    transform = jnp.asarray(np.eye(4), jnp.float32).at[3, :].set(
        jnp.asarray([0.0, 0.0, 1e-3, 1.0])
    )
    lod_n = jnp.full((dp,), 64, jnp.int32)
    scale = jnp.asarray([0.01, 0.01, 0.01], jnp.float32)
    offset_rel = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)

    sharded = shard_streams_host({k: np.asarray(v) for k, v in scene.items()}, dp)
    # each shard holds only its own stream bytes (1 batch here)
    assert sharded["encoding"].shape[0] == dp
    assert sharded["encoding"].size < np.asarray(scene["encoding"]).size * dp
    args_sh = (
        jnp.asarray(sharded["encoding"]), jnp.asarray(sharded["enc_offsets"]),
        scene["cluster_sizes"],
        jnp.asarray(sharded["separate"]), jnp.asarray(sharded["sep_offsets"]),
        scene["separate_sizes"], scene["table_values"], scene["table_cw_len"],
        scene["start_values"], lod_n, transform, scale, offset_rel,
    )

    img_sharded = np.asarray(jax.jit(make_multichip_render(mesh, W, H))(*args_sh))

    # single-device reference (flat streams, global payload ids)
    coords = decode_batches_core(
        scene["encoding"], scene["enc_offsets"], scene["cluster_sizes"],
        scene["separate"], scene["sep_offsets"], scene["separate_sizes"],
        scene["table_values"], scene["table_cw_len"], scene["start_values"],
    )
    fb_d, fb_p = _local_raster(coords, scale, offset_rel, lod_n, transform, W, H)
    img_single = np.asarray(
        jnp.where(fb_p != jnp.uint32(0xFFFFFFFF), fb_p, jnp.uint32(0x00443322))
    ).reshape(H, W)

    # payloads are rebased to global chunk ids, so the sharded winner is
    # exactly the single-device winner (u64-min semantics are exact)
    mismatch = np.argwhere(img_sharded != img_single)
    assert mismatch.size == 0, f"{mismatch.shape[0]} mismatching pixels"
    assert (img_sharded != 0x00443322).sum() >= 10  # tiny synthetic scene
