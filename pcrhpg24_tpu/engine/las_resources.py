"""Uncompressed / fixed-point LAS scene resources.

Three loaders mirroring the reference's non-Huffman resource types:

* ComputeLasData — adaptive 10/20/30-bit batch-relative fixed point in
  three packed-u32 planes (reference: modules/compute/ComputeLasLoader.h
  + modules/compute/computeLasLoader.cs:280-345).  The reference packs
  on the GPU with a compute shader; here a jitted device function does
  the same (upload raw grid coords once, pack on device).
* ComputeLasDataBasic — raw int32 SoA + color (ComputeLasLoader.h:111-223).
* LasStandardData — 16 B/point: f32 xyz + RGBA8 (the 2021 baseline,
  modules/compute/LasLoaderStandard.h:110-175).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import POINTS_PER_WORKGROUP, RENDER_CHUNK_BATCHES
from ..formats.las import read_header, read_points
from .resource import Resource, ResourceState, _upload_1d, _upload_rows

STEPS_30BIT = 1 << 30
MASK_10BIT = 1023


@jax.jit
def pack_101010(pos_f32, rgba, wg_min, wg_max):
    """Device-side equivalent of computeLasLoader.cs:280-345.

    pos_f32: (n, 3) render-frame positions; wg_min/wg_max: (n, 3) f32
    per-point batch bbox.  Returns (xyz4, xyz8, xyz12, rgba) u32 planes.
    """
    pos = pos_f32
    box = wg_max - wg_min
    u = (pos - wg_min) / jnp.maximum(box, 1e-20) * STEPS_30BIT
    q = jnp.clip(u.astype(jnp.uint32), 0, STEPS_30BIT - 1)

    def plane(shift):
        p = (q >> shift) & MASK_10BIT
        return p[:, 0] | (p[:, 1] << 10) | (p[:, 2] << 20)

    return plane(20), plane(10), plane(0), rgba


class ComputeLasData(Resource):
    """10-10-10 adaptive precision scene (the 2022 paper's main format)."""

    def __init__(self, path: str):
        self.path = path
        h = read_header(path)
        self.header = h
        self.num_points = h.num_points
        self.num_batches = (h.num_points + POINTS_PER_WORKGROUP - 1) // POINTS_PER_WORKGROUP
        self.num_points_loaded = 0
        self.num_batches_loaded = 0
        self.scale = h.scale
        self.offset = h.offset
        self.las_min = h.cmin
        self.bbox_min = np.zeros((self.num_batches, 3), np.float32)
        self.bbox_max = np.zeros((self.num_batches, 3), np.float32)
        self.dev: dict[str, jax.Array] = {}

    @classmethod
    def create(cls, path: str):
        return cls(path)

    def load(self, renderer=None):
        if self.state != ResourceState.UNLOADED:
            return
        self.state = ResourceState.LOADING
        n_pad = (
            -(-self.num_batches // RENDER_CHUNK_BATCHES)
            * RENDER_CHUNK_BATCHES
            * POINTS_PER_WORKGROUP
        )
        self.dev = dict(
            xyz4=jnp.zeros(n_pad, jnp.uint32),
            xyz8=jnp.zeros(n_pad, jnp.uint32),
            xyz12=jnp.zeros(n_pad, jnp.uint32),
            rgba=jnp.zeros(n_pad, jnp.uint32),
        )

    def process(self, renderer=None, chunk_points: int = 4 * POINTS_PER_WORKGROUP):
        """Load + pack the next chunk of points (synchronous streaming)."""
        if self.state == ResourceState.LOADED or self.state == ResourceState.UNLOADED:
            return
        start = self.num_points_loaded
        if start >= self.num_points:
            self.state = ResourceState.LOADED
            return
        count = min(chunk_points, self.num_points - start)
        pts = read_points(self.path, start, count)
        n = len(pts.x)
        pad = (-n) % POINTS_PER_WORKGROUP
        x = np.concatenate([pts.x, np.full(pad, pts.x[-1], np.int32)])
        y = np.concatenate([pts.y, np.full(pad, pts.y[-1], np.int32)])
        z = np.concatenate([pts.z, np.full(pad, pts.z[-1], np.int32)])
        c = np.concatenate([pts.color, np.full(pad, pts.color[-1], np.uint32)])

        xyz = np.stack([x, y, z], 1).astype(np.int32)
        # render frame: float(double(grid)*scale + offset - las_min)
        # (computeLasLoader.cs:179-181)
        rel = (
            xyz.astype(np.float64) * self.scale + self.offset - self.las_min
        ).astype(np.float32)
        nb = len(x) // POINTS_PER_WORKGROUP
        wb = rel.reshape(nb, POINTS_PER_WORKGROUP, 3)
        bmin = wb.min(axis=1)
        bmax = wb.max(axis=1)
        b0 = start // POINTS_PER_WORKGROUP
        self.bbox_min[b0 : b0 + nb] = bmin
        self.bbox_max[b0 : b0 + nb] = bmax

        wmin = np.repeat(bmin, POINTS_PER_WORKGROUP, axis=0)
        wmax = np.repeat(bmax, POINTS_PER_WORKGROUP, axis=0)
        p4, p8, p12, rgba = pack_101010(
            jnp.asarray(rel), jnp.asarray(c), jnp.asarray(wmin), jnp.asarray(wmax)
        )
        d = self.dev
        d["xyz4"] = _upload_1d(d["xyz4"], start, p4)
        d["xyz8"] = _upload_1d(d["xyz8"], start, p8)
        d["xyz12"] = _upload_1d(d["xyz12"], start, p12)
        d["rgba"] = _upload_1d(d["rgba"], start, rgba)
        self.num_points_loaded = start + len(x)
        self.num_batches_loaded = self.num_points_loaded // POINTS_PER_WORKGROUP
        if self.num_points_loaded >= self.num_points:
            self.state = ResourceState.LOADED

    def unload(self, renderer=None):
        self.dev = {}
        self.num_points_loaded = 0
        self.num_batches_loaded = 0
        self.state = ResourceState.UNLOADED

    def wait_loaded(self, renderer=None):
        self.load(renderer)
        while self.state != ResourceState.LOADED:
            self.process(renderer)
        return self


class ComputeLasDataBasic(Resource):
    """Raw int32 SoA + color (basic_cuda's resource)."""

    def __init__(self, path: str):
        self.path = path
        h = read_header(path)
        self.header = h
        self.num_points = h.num_points
        self.num_batches = (h.num_points + POINTS_PER_WORKGROUP - 1) // POINTS_PER_WORKGROUP
        self.num_points_loaded = 0
        self.num_batches_loaded = 0
        self.scale = h.scale
        self.offset = h.offset
        self.las_min = h.cmin
        self.bbox_min = np.zeros((self.num_batches, 3), np.float32)
        self.bbox_max = np.zeros((self.num_batches, 3), np.float32)
        self.dev: dict[str, jax.Array] = {}

    @classmethod
    def create(cls, path: str):
        return cls(path)

    def load(self, renderer=None):
        if self.state != ResourceState.UNLOADED:
            return
        self.state = ResourceState.LOADING
        n_pad = (
            -(-self.num_batches // RENDER_CHUNK_BATCHES)
            * RENDER_CHUNK_BATCHES
            * POINTS_PER_WORKGROUP
        )
        self.dev = dict(
            x=jnp.zeros(n_pad, jnp.int32),
            y=jnp.zeros(n_pad, jnp.int32),
            z=jnp.zeros(n_pad, jnp.int32),
            rgba=jnp.zeros(n_pad, jnp.uint32),
        )

    def process(self, renderer=None, chunk_points: int = 4 * POINTS_PER_WORKGROUP):
        if self.state in (ResourceState.LOADED, ResourceState.UNLOADED):
            return
        start = self.num_points_loaded
        if start >= self.num_points:
            self.state = ResourceState.LOADED
            return
        count = min(chunk_points, self.num_points - start)
        pts = read_points(self.path, start, count)
        n = len(pts.x)
        pad = (-n) % POINTS_PER_WORKGROUP
        x = np.concatenate([pts.x, np.full(pad, pts.x[-1], np.int32)])
        y = np.concatenate([pts.y, np.full(pad, pts.y[-1], np.int32)])
        z = np.concatenate([pts.z, np.full(pad, pts.z[-1], np.int32)])
        c = np.concatenate([pts.color, np.full(pad, pts.color[-1], np.uint32)])
        rel = (
            np.stack([x, y, z], 1).astype(np.float64) * self.scale + self.offset
            - self.las_min
        )
        nb = len(x) // POINTS_PER_WORKGROUP
        wb = rel.reshape(nb, POINTS_PER_WORKGROUP, 3)
        b0 = start // POINTS_PER_WORKGROUP
        self.bbox_min[b0 : b0 + nb] = wb.min(axis=1)
        self.bbox_max[b0 : b0 + nb] = wb.max(axis=1)
        d = self.dev
        d["x"] = _upload_1d(d["x"], start, jnp.asarray(x))
        d["y"] = _upload_1d(d["y"], start, jnp.asarray(y))
        d["z"] = _upload_1d(d["z"], start, jnp.asarray(z))
        d["rgba"] = _upload_1d(d["rgba"], start, jnp.asarray(c))
        self.num_points_loaded = start + len(x)
        self.num_batches_loaded = self.num_points_loaded // POINTS_PER_WORKGROUP
        if self.num_points_loaded >= self.num_points:
            self.state = ResourceState.LOADED

    def unload(self, renderer=None):
        self.dev = {}
        self.num_points_loaded = 0
        self.state = ResourceState.UNLOADED

    def wait_loaded(self, renderer=None):
        self.load(renderer)
        while self.state != ResourceState.LOADED:
            self.process(renderer)
        return self


class LasStandardData(ComputeLasDataBasic):
    """16 B/point standard format: f32 xyz + RGBA8 (2021 baselines).

    Stored on device as f32 planes in the render frame (world - las_min,
    like LasLoaderStandard's XYZ floats)."""

    def load(self, renderer=None):
        if self.state != ResourceState.UNLOADED:
            return
        self.state = ResourceState.LOADING
        n_pad = (
            -(-self.num_batches // RENDER_CHUNK_BATCHES)
            * RENDER_CHUNK_BATCHES
            * POINTS_PER_WORKGROUP
        )
        self.dev = dict(
            fx=jnp.zeros(n_pad, jnp.float32),
            fy=jnp.zeros(n_pad, jnp.float32),
            fz=jnp.zeros(n_pad, jnp.float32),
            rgba=jnp.zeros(n_pad, jnp.uint32),
        )

    def process(self, renderer=None, chunk_points: int = 4 * POINTS_PER_WORKGROUP):
        if self.state in (ResourceState.LOADED, ResourceState.UNLOADED):
            return
        start = self.num_points_loaded
        if start >= self.num_points:
            self.state = ResourceState.LOADED
            return
        count = min(chunk_points, self.num_points - start)
        pts = read_points(self.path, start, count)
        n = len(pts.x)
        pad = (-n) % POINTS_PER_WORKGROUP
        x = np.concatenate([pts.x, np.full(pad, pts.x[-1], np.int32)])
        y = np.concatenate([pts.y, np.full(pad, pts.y[-1], np.int32)])
        z = np.concatenate([pts.z, np.full(pad, pts.z[-1], np.int32)])
        c = np.concatenate([pts.color, np.full(pad, pts.color[-1], np.uint32)])
        world = np.stack([x, y, z], 1).astype(np.float64) * self.scale + self.offset
        rel = (world - self.las_min).astype(np.float32)
        nb = len(x) // POINTS_PER_WORKGROUP
        wb = rel.reshape(nb, POINTS_PER_WORKGROUP, 3)
        b0 = start // POINTS_PER_WORKGROUP
        self.bbox_min[b0 : b0 + nb] = wb.min(axis=1)
        self.bbox_max[b0 : b0 + nb] = wb.max(axis=1)
        d = self.dev
        d["fx"] = _upload_1d(d["fx"], start, jnp.asarray(rel[:, 0]))
        d["fy"] = _upload_1d(d["fy"], start, jnp.asarray(rel[:, 1]))
        d["fz"] = _upload_1d(d["fz"], start, jnp.asarray(rel[:, 2]))
        d["rgba"] = _upload_1d(d["rgba"], start, jnp.asarray(c))
        self.num_points_loaded = start + len(x)
        self.num_batches_loaded = self.num_points_loaded // POINTS_PER_WORKGROUP
        if self.num_points_loaded >= self.num_points:
            self.state = ResourceState.LOADED
