"""Multi-chip rendering over a jax device mesh.

The reference is single-GPU (SURVEY.md §2.7); the natural multi-chip
extension is data-parallel over batches with a framebuffer merge:

* batches (and their decoder state rows) are sharded over the `dp` mesh
  axis — decoding is embarrassingly parallel,
* the flat byte streams are sharded too: `shard_streams_host` splits the
  encoding/separate streams so each device holds only its own batches'
  words (rebased offsets, rows padded to the longest shard),
* each device rasterizes its shard into a full-resolution local
  framebuffer (exact chunk-local u64 semantics) with payloads offset by
  the shard's global chunk base, so depth ties break identically to a
  single-device render,
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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.decode_jax import decode_batches_core
from ..render.raster import EMPTY, project
from ..constants import POINTS_PER_THREAD


def shard_streams_host(scene: dict, dp: int) -> dict:
    """Split the flat encoding/separate streams into per-dp-shard rows.

    Input `scene` maps names -> arrays as produced by `batches_to_device`
    (flat `encoding` (E,) u32 / `separate` (S,) i32 with per-batch element
    offsets).  Returns a copy where `encoding` is (dp, Le) and `separate`
    is (dp, Ls) — each row zero-padded to the longest shard — and the
    offsets are rebased shard-locally.  Each dp device then holds ~1/dp
    of the stream bytes instead of a full replica.
    """
    enc = np.asarray(scene["encoding"])
    sep = np.asarray(scene["separate"])
    eo = np.asarray(scene["enc_offsets"])
    so = np.asarray(scene["sep_offsets"])
    B = eo.shape[0]
    if B % dp != 0:
        raise ValueError(f"batches {B} not divisible by dp {dp}")
    per = B // dp
    ebase = eo[::per].astype(np.int64)
    sbase = so[::per].astype(np.int64)
    ebounds = np.concatenate([ebase, [len(enc)]])
    sbounds = np.concatenate([sbase, [len(sep)]])
    Le = max(1, int((ebounds[1:] - ebounds[:-1]).max()))
    Ls = max(1, int((sbounds[1:] - sbounds[:-1]).max()))
    enc_rows = np.zeros((dp, Le), enc.dtype)
    sep_rows = np.zeros((dp, Ls), sep.dtype if sep.size else np.int32)
    for s in range(dp):
        e = enc[ebounds[s] : ebounds[s + 1]]
        enc_rows[s, : len(e)] = e
        v = sep[sbounds[s] : sbounds[s + 1]]
        sep_rows[s, : len(v)] = v
    out = dict(scene)
    out["encoding"] = enc_rows
    out["separate"] = sep_rows
    out["enc_offsets"] = (eo.astype(np.int64) - np.repeat(ebase, per)).astype(np.int32)
    out["sep_offsets"] = (so.astype(np.int64) - np.repeat(sbase, per)).astype(np.int32)
    return out


def _local_raster(coords, scale, offset_rel, lod_n, transform, width, height,
                  payload_base=0):
    """Chunk-local exact (depth,payload) raster of decoded coords.

    `payload_base` offsets the per-chunk payload ids; sharded callers
    pass the shard's global chunk base so ties break device-count-
    invariantly (same winner as a single-device render).
    """
    pos = coords.astype(jnp.float32) * scale + offset_rel
    C = coords.shape[0]
    pt_idx = jnp.arange(POINTS_PER_THREAD, dtype=jnp.int32)
    mask = jnp.broadcast_to(
        pt_idx[None, None, :] < lod_n[:, None, None], coords.shape[:3]
    ).reshape(-1)
    payload = jnp.broadcast_to(
        (jnp.uint32(payload_base) + jnp.arange(C, dtype=jnp.uint32))[:, None, None],
        coords.shape[:3],
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

    Expects stream arrays pre-sharded by `shard_streams_host(scene, dp)`:
    `encoding` (dp, Le), `separate` (dp, Ls), offsets shard-local.
    Per-batch arrays are sharded over `dp`.
    """
    sp = mesh.shape["sp"]
    if height % sp != 0:
        raise ValueError(f"height {height} not divisible by sp {sp}")

    def step(
        encoding, enc_offsets, cluster_sizes, separate, sep_offsets,
        separate_sizes, table_values, table_cw_len, start_values,
        lod_n, transform, scale, offset_rel,
    ):
        coords = decode_batches_core(
            encoding.reshape(-1), enc_offsets, cluster_sizes,
            separate.reshape(-1), sep_offsets,
            separate_sizes, table_values, table_cw_len, start_values,
        )
        C = coords.shape[0]  # chunks in this shard (static)
        dp_idx = jax.lax.axis_index("dp")
        fb_d, fb_p = _local_raster(
            coords, scale, offset_rel, lod_n, transform, width, height,
            payload_base=dp_idx.astype(jnp.uint32) * jnp.uint32(C),
        )
        # lexicographic (depth,payload) min across the dp axis:
        fb_d_min = jax.lax.pmin(fb_d, "dp")
        cand = jnp.where(fb_d == fb_d_min, fb_p, EMPTY)
        fb_p_min = jax.lax.pmin(cand, "dp")

        # resolve sharded over sp: each device handles a row-slice
        rows = height // sp
        sp_idx = jax.lax.axis_index("sp")
        sl = jax.lax.dynamic_slice_in_dim(
            fb_p_min, sp_idx * rows * width, rows * width
        )
        img = jnp.where(sl != EMPTY, sl, jnp.uint32(0x00443322)).reshape(rows, width)
        return img

    batch_spec = P("dp")
    stream_spec = P("dp", None)
    rep = P()
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            stream_spec, batch_spec, batch_spec, stream_spec, batch_spec,
            batch_spec, batch_spec, batch_spec, batch_spec, batch_spec,
            rep, rep, rep,
        ),
        out_specs=P("sp", None),
        check_vma=False,
    )
