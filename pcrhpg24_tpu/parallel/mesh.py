"""Multi-chip rendering over a jax device mesh.

The reference is single-GPU (SURVEY.md §2.7); the natural multi-chip
extension is data-parallel over batches with a framebuffer merge:

* batches (and their decoder state rows) are sharded over the `dp` mesh
  axis — decoding is embarrassingly parallel,
* each device rasterizes its shard into a full-resolution local
  framebuffer (exact chunk-local u64 semantics),
* framebuffers merge with a lexicographic (depth, payload) min across
  `dp` — two `pmin` collectives over ICI,
* the resolve is sharded over the `sp` (screen) axis: each device
  resolves its slice of rows, and the image is reassembled by the
  out-sharding (a reduce-scatter-like layout, no host gather).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.decode_jax import decode_batches_core
from ..render.raster import EMPTY, project
from ..constants import POINTS_PER_THREAD


def _local_raster(coords, scale, offset_rel, lod_n, transform, width, height):
    """Chunk-local exact (depth,payload) raster of decoded coords."""
    pos = coords.astype(jnp.float32) * scale + offset_rel
    C = coords.shape[0]
    pt_idx = jnp.arange(POINTS_PER_THREAD, dtype=jnp.int32)
    mask = jnp.broadcast_to(
        pt_idx[None, None, :] < lod_n[:, None, None], coords.shape[:3]
    ).reshape(-1)
    payload = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.uint32)[:, None, None], coords.shape[:3]
    ).reshape(-1)

    p = pos.reshape(-1, 3)
    clip = project(p, transform)
    w = clip[:, 3]
    ndc_x = clip[:, 0] / w
    ndc_y = clip[:, 1] / w
    ok = mask & (w > 0) & (jnp.abs(ndc_x) <= 1) & (jnp.abs(ndc_y) <= 1)
    px = ((ndc_x * 0.5 + 0.5) * width).astype(jnp.int32)
    py = ((ndc_y * 0.5 + 0.5) * height).astype(jnp.int32)
    ok &= (px >= 0) & (px < width) & (py >= 0) & (py < height)
    size = width * height
    pid = jnp.where(ok, px + py * width, size)
    depth = jax.lax.bitcast_convert_type(w, jnp.uint32)
    fb_d = jnp.full((size,), EMPTY, jnp.uint32).at[pid].min(depth, mode="drop")
    winner = ok & (depth == fb_d[jnp.clip(pid, 0, size - 1)])
    fb_p = (
        jnp.full((size,), EMPTY, jnp.uint32)
        .at[jnp.where(winner, pid, size)]
        .min(payload, mode="drop")
    )
    return fb_d, fb_p


def make_multichip_render(mesh: Mesh, width: int, height: int):
    """Build the sharded render step.

    Per-batch arrays are sharded over `dp`; the flat streams are
    replicated (a production loader shards them too — each device only
    needs its own batches' byte ranges).
    """

    def step(
        encoding, enc_offsets, cluster_sizes, separate, sep_offsets,
        separate_sizes, table_values, table_cw_len, start_values,
        lod_n, transform, scale, offset_rel,
    ):
        coords = decode_batches_core(
            encoding, enc_offsets, cluster_sizes, separate, sep_offsets,
            separate_sizes, table_values, table_cw_len, start_values,
        )
        fb_d, fb_p = _local_raster(
            coords, scale, offset_rel, lod_n, transform, width, height
        )
        # lexicographic (depth,payload) min across the dp axis:
        fb_d_min = jax.lax.pmin(fb_d, "dp")
        cand = jnp.where(fb_d == fb_d_min, fb_p, EMPTY)
        fb_p_min = jax.lax.pmin(cand, "dp")

        # resolve sharded over sp: each device handles a row-slice
        rows = height // mesh.shape["sp"]
        sp_idx = jax.lax.axis_index("sp")
        sl = jax.lax.dynamic_slice_in_dim(
            fb_p_min, sp_idx * rows * width, rows * width
        )
        img = jnp.where(sl != EMPTY, sl, jnp.uint32(0x00443322)).reshape(rows, width)
        return img

    batch_spec = P("dp")
    rep = P()
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            rep, batch_spec, batch_spec, rep, batch_spec, batch_spec,
            batch_spec, batch_spec, batch_spec, batch_spec, rep, rep, rep,
        ),
        out_specs=P("sp", None),
        check_vma=False,
    )
