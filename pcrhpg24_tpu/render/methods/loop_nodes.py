"""`loop_nodes` — Potree octree LOD rendering.

Replicates modules/compute_loop_nodes: one unit of work per octree node
(instead of per fixed batch), frustum culling plus the LOD cut — nodes
whose projected bbox is smaller than 80 px are skipped entirely (their
parents' subsampled points already cover those pixels;
compute_loop_nodes/render.cs:211-226, 292-296) — then the standard
10-10-10 node-relative unpack and depth-test raster.  `loop_nodes_hqs`
adds the average-blend second pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...engine.debug import Debug
from ...engine.method import Method, Runtime
from ..camera import batches_in_frustum, frustum_planes
from ..raster import EMPTY, resolve
from .loop_las import raster_chunk_101010, resolve_indexed

CHUNK_PTS = 1 << 24  # 16.7M points per device pass

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n_pad",))
def _expand_frame_codes(deltas, starts, n_pad: int):
    """Scatter per-node code deltas at node starts, cumsum to per-point."""
    plane = jnp.zeros((n_pad,), jnp.int32).at[starts].add(deltas, mode="drop")
    return jnp.cumsum(plane)


def node_levels(view, proj, bmin, bmax, width, height):
    """Precision level per node; >= 4 culls it (render.cs:205-226)."""
    center = 0.5 * (bmin + bmax)
    radius = np.linalg.norm(bmin - bmax, axis=1)
    ch = np.concatenate([center, np.ones((len(center), 1))], 1)
    vc = ch @ view.T
    ve = vc + np.stack([radius, *([np.zeros_like(radius)] * 3)], 1)
    pc = vc @ proj.T
    pe = ve @ proj.T
    sc = 0.5 * (pc[:, :2] / pc[:, 3:4] + 1) * [width, height]
    se = 0.5 * (pe[:, :2] / pe[:, 3:4] + 1) * [width, height]
    ps = np.linalg.norm(se - sc, axis=1)
    level = np.zeros(len(ps), np.int32)
    level[ps < 10000] = 1
    level[ps < 500] = 2
    level[ps < 200] = 3
    level[ps < 80] = 4
    return level


class ComputeLoopNodes(Method):
    def __init__(self, renderer, potree, name="loop_nodes"):
        self.name = name
        self.description = "Potree octree nodes, 10-10-10 node-relative"
        self.group = "potree"
        self.potree = potree
        self.renderer = renderer
        self._pt_cache = None

    def update(self, renderer):
        if Runtime.resource is not self.potree:
            if Runtime.resource is not None:
                Runtime.resource.unload(renderer)
            self.potree.load(renderer)
            Runtime.resource = self.potree

    def _per_point_tables(self, n_loaded):
        """Node-CONSTANT per-point tables, device-resident.

        Built once per n_loaded change (an upload event), never per
        frame: node bboxes don't move.  Per-frame state (LOD level +
        visibility) is expanded on device from O(nodes) data by
        `_expand_frame_codes` — the reference's analogue is per-node
        uniforms read by each workgroup (compute_loop_nodes.h:184-185);
        round-1 rebuilt all per-point arrays on the host every frame,
        an O(points) wall the reference doesn't have.
        """
        p = self.potree
        if self._pt_cache is not None and self._pt_cache[0] == n_loaded:
            return self._pt_cache[1]
        counts = p.node_count[: p.nodes_loaded]
        node_of_pt = np.repeat(np.arange(len(counts)), counts)
        nn = p.nodes_loaded
        n_pad = int(p.dev["xyz4"].shape[0])

        def padded(a):
            out = np.zeros((n_pad,) + a.shape[1:], a.dtype)
            out[: len(node_of_pt)] = a
            return jnp.asarray(out)

        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        tables = dict(
            bmin_pt=padded(p.bbox_min[:nn][node_of_pt].astype(np.float32)),
            bmax_pt=padded(p.bbox_max[:nn][node_of_pt].astype(np.float32)),
            starts=jnp.asarray(
                np.concatenate([starts, [len(node_of_pt)]]).astype(np.int32)
            ),
        )
        self._pt_cache = (n_loaded, tables)
        return tables

    def _frame_codes(self, level, vis, tables, n_pad):
        """(level*2|vis) per point, expanded on device in O(nodes) host work."""
        code = (level.astype(np.int32) << 1) | vis.astype(np.int32)
        # delta-encode so a tiny scatter + device cumsum rebuilds the
        # step-constant per-point plane; a trailing delta zeroes the pad
        # region (vis=0 there)
        deltas = np.concatenate([code[:1], np.diff(code), [-code[-1]]])
        codes = _expand_frame_codes(
            jnp.asarray(deltas.astype(np.int32)), tables["starts"], n_pad
        )
        return codes >> 1, (codes & 1).astype(bool)

    def render(self, renderer):
        p = self.potree
        p.process(renderer)
        W, H = renderer.width, renderer.height
        fb_d = jnp.full((W * H,), EMPTY, jnp.uint32)
        fb_p = jnp.full((W * H,), EMPTY, jnp.uint32)
        n_loaded = p.num_points_loaded
        if n_loaded == 0:
            return resolve(fb_p, W, H)

        cam = renderer.camera
        view, proj = cam.view(), cam.proj()
        wvp = jnp.asarray((proj @ view).astype(np.float32))
        nn = p.nodes_loaded
        bmin, bmax = p.bbox_min[:nn], p.bbox_max[:nn]
        if Debug.frustum_culling_enabled and Debug.update_frustum:
            vis = batches_in_frustum(frustum_planes(proj @ view), bmin, bmax)
        else:
            vis = np.ones(nn, bool)
        level = node_levels(view, proj, bmin, bmax, W, H)
        vis &= level < 4  # the LOD cut

        d = p.dev
        n_pad = d["xyz4"].shape[0]
        tables = self._per_point_tables(n_loaded)
        bmin_pt, bmax_pt = tables["bmin_pt"], tables["bmax_pt"]
        lvl_pt, vis_pt = self._frame_codes(level, vis, tables, n_pad)

        for s in range(0, n_pad, CHUNK_PTS):
            sl = slice(s, min(s + CHUNK_PTS, n_pad))
            fb_d, fb_p = raster_chunk_101010(
                d["xyz4"][sl], d["xyz8"][sl], d["xyz12"][sl],
                lvl_pt[sl], bmin_pt[sl], bmax_pt[sl], wvp,
                jnp.uint32(s), fb_d, fb_p, W, H, vis_pt[sl],
            )
        renderer.last_fb = (fb_d, fb_p)
        return resolve_indexed(fb_p, d["rgba"], W, H)


class ComputeLoopNodesHqs(ComputeLoopNodes):
    """HQS over Potree nodes (modules/compute_loop_nodes_hqs)."""

    def __init__(self, renderer, potree):
        super().__init__(renderer, potree, name="loop_nodes_hqs")
        self.description = "Potree octree nodes, HQS average blend"

    def render(self, renderer):
        from .huffman_hqs import resolve_hqs

        p = self.potree
        p.process(renderer)
        W, H = renderer.width, renderer.height
        if p.num_points_loaded == 0:
            return jnp.full((H, W), jnp.uint32(0x00443322))

        img_fb = super().render(renderer)  # depth pass via parent (fills last_fb)
        fb_d, _ = renderer.last_fb

        cam = renderer.camera
        wvp = jnp.asarray((cam.proj() @ cam.view()).astype(np.float32))
        d = p.dev
        size = W * H
        acc = [jnp.zeros((size,), jnp.uint32) for _ in range(4)]
        n_loaded = p.num_points_loaded
        nn = p.nodes_loaded
        view, proj = cam.view(), cam.proj()
        level = node_levels(view, proj, p.bbox_min[:nn], p.bbox_max[:nn], W, H)
        vis = batches_in_frustum(
            frustum_planes(proj @ view), p.bbox_min[:nn], p.bbox_max[:nn]
        ) & (level < 4)

        n_pad = d["xyz4"].shape[0]
        tables = self._per_point_tables(n_loaded)
        bmin_pt, bmax_pt = tables["bmin_pt"], tables["bmax_pt"]
        lvl_pt, vis_pt = self._frame_codes(level, vis, tables, n_pad)

        acc = _hqs_accumulate_101010(
            d, lvl_pt, bmin_pt, bmax_pt, vis_pt, wvp, fb_d, acc, W, H
        )
        renderer.last_fb = (fb_d, acc[3])
        return resolve_hqs(*acc, W, H)


def _hqs_accumulate_101010(d, lvl_pt, bmin_pt, bmax_pt, vis_pt, wvp, fb_d, acc, W, H):
    from functools import partial

    @partial(jax.jit, static_argnames=("width", "height"), donate_argnums=(8, 9, 10, 11))
    def step(xyz4, xyz8, xyz12, lvl, bmi, bma, vis, rgba, acc_r, acc_g, acc_b,
             acc_n, transform, fbd, width: int, height: int):
        MASK = 1023

        def unpack(plane, shift):
            pp = plane.astype(jnp.uint32)
            return (
                ((pp >> 0) & MASK) << shift,
                ((pp >> 10) & MASK) << shift,
                ((pp >> 20) & MASK) << shift,
            )

        x4, y4, z4 = unpack(xyz4, 20)
        x8, y8, z8 = unpack(xyz8, 10)
        x12, y12, z12 = unpack(xyz12, 0)
        X = jnp.where(lvl == 0, x4 | x8 | x12, jnp.where(lvl == 1, x4 | x8, x4))
        Y = jnp.where(lvl == 0, y4 | y8 | y12, jnp.where(lvl == 1, y4 | y8, y4))
        Z = jnp.where(lvl == 0, z4 | z8 | z12, jnp.where(lvl == 1, z4 | z8, z4))
        denom = jnp.where(lvl >= 2, 1024.0, float(1 << 30))
        Xs = jnp.where(lvl >= 2, X >> 20, X).astype(jnp.float32)
        Ys = jnp.where(lvl >= 2, Y >> 20, Y).astype(jnp.float32)
        Zs = jnp.where(lvl >= 2, Z >> 20, Z).astype(jnp.float32)
        box = bma - bmi
        px_ = Xs * (box[:, 0] / denom) + bmi[:, 0]
        py_ = Ys * (box[:, 1] / denom) + bmi[:, 1]
        pz_ = Zs * (box[:, 2] / denom) + bmi[:, 2]
        t = transform.astype(jnp.float32)
        cx = t[0, 0] * px_ + t[0, 1] * py_ + t[0, 2] * pz_ + t[0, 3]
        cy = t[1, 0] * px_ + t[1, 1] * py_ + t[1, 2] * pz_ + t[1, 3]
        w = t[3, 0] * px_ + t[3, 1] * py_ + t[3, 2] * pz_ + t[3, 3]
        ndc_x, ndc_y = cx / w, cy / w
        ok = vis & (w > 0) & (jnp.abs(ndc_x) <= 1) & (jnp.abs(ndc_y) <= 1)
        sx = ((ndc_x * 0.5 + 0.5) * width).astype(jnp.int32)
        sy = ((ndc_y * 0.5 + 0.5) * height).astype(jnp.int32)
        ok &= (sx >= 0) & (sx < width) & (sy >= 0) & (sy < height)
        size = width * height
        pid = jnp.where(ok, sx + sy * width, size)
        old = jax.lax.bitcast_convert_type(fbd[jnp.clip(pid, 0, size - 1)], jnp.float32)
        keep = ok & (w <= old * 1.01)
        pid2 = jnp.where(keep, pid, size)
        acc_r = acc_r.at[pid2].add(rgba & 0xFF, mode="drop")
        acc_g = acc_g.at[pid2].add((rgba >> 8) & 0xFF, mode="drop")
        acc_b = acc_b.at[pid2].add((rgba >> 16) & 0xFF, mode="drop")
        acc_n = acc_n.at[pid2].add(jnp.uint32(1), mode="drop")
        return acc_r, acc_g, acc_b, acc_n

    n_pad = d["xyz4"].shape[0]
    for s in range(0, n_pad, CHUNK_PTS):
        sl = slice(s, min(s + CHUNK_PTS, n_pad))
        acc = list(
            step(
                d["xyz4"][sl], d["xyz8"][sl], d["xyz12"][sl], lvl_pt[sl],
                bmin_pt[sl], bmax_pt[sl], vis_pt[sl], d["rgba"][sl],
                *acc, wvp, fb_d, W, H,
            )
        )
    return acc
