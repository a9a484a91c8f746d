"""Potree octree scene resource with coarse-first bin streaming.

Mirrors the reference's PotreeData runtime (reference: modules/compute/
PotreeData.h:288-311, 380-549): nodes greedily packed into ~1M-point
bins ordered coarse-level-first; a loader thread reads bins and each
node's points are re-encoded to node-relative 10-10-10 fixed-point
planes (PotreeData.h:469-513); the per-frame `process()` uploads one
bin's worth of packed points.
"""

from __future__ import annotations

import threading
from queue import Empty, Queue

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.potree import parse_hierarchy, read_metadata, read_node_points
from .las_resources import pack_101010
from .resource import Resource, ResourceState, _upload_1d

BIN_POINTS = 1_000_000
# uploads pad to this quantum so jitted pack/upload programs compile a
# handful of shapes instead of one per bin (see PotreeData.process)
UPLOAD_QUANTUM = 1 << 20


class PotreeData(Resource):
    def __init__(self, path: str, budget_points: int | None = None):
        """`budget_points` caps DEVICE residency: bins stream in
        coarse-first order until the cap, finer nodes stay on disk.
        This is how >HBM datasets render — the coarse-first order
        guarantees the resident set is a valid LOD prefix (parents
        before children), so the 80-px cut simply never reaches the
        unresident fine levels.  (The reference's GPU analogue keeps a
        fixed-size buffer and streams bins into it,
        PotreeData.h:288-311, 575-605.)"""
        self.path = path
        self.meta = read_metadata(path)
        self.nodes = parse_hierarchy(path, self.meta)
        self.nodes = [n for n in self.nodes if n.num_points > 0]
        self.num_points = sum(n.num_points for n in self.nodes)
        self.las_min = self.meta.bbox_min
        # bins: coarse-first (PotreeData.h:288-311)
        bins, cur, cur_n, cur_w = [], [], 0, 1e9
        for nd in self.nodes:
            cur.append(nd)
            cur_n += nd.num_points
            cur_w = min(cur_w, nd.level)
            if cur_n > BIN_POINTS:
                bins.append((cur_w, cur))
                cur, cur_n, cur_w = [], 0, 1e9
        if cur:
            bins.append((cur_w, cur))
        bins.sort(key=lambda b: b[0])
        self.bins = [b[1] for b in bins]
        self.resident_limited = False
        if budget_points is not None:
            kept, cum = [], 0
            for bn in self.bins:
                nb = sum(n.num_points for n in bn)
                if kept and cum + nb > budget_points:
                    break
                kept.append(bn)
                cum += nb
            self.resident_limited = len(kept) < len(self.bins)
            self.bins = kept

        # node table (render frame = world - bbox_min of the octree)
        order = [n for bn in self.bins for n in bn]
        self.nodes = order
        self.node_offset = np.zeros(len(self.nodes), np.int64)
        off = 0
        for i, nd in enumerate(order):
            self.node_offset[i] = off
            off += nd.num_points
        self.total_points = off
        self.node_count = np.array([n.num_points for n in order], np.int64)
        self.node_level = np.array([n.level for n in order], np.int32)
        self.bbox_min = np.stack(
            [(n.bbox_min - self.las_min) for n in order]
        ).astype(np.float32)
        self.bbox_max = np.stack(
            [(n.bbox_max - self.las_min) for n in order]
        ).astype(np.float32)
        self.nodes_loaded = 0
        self.num_points_loaded = 0
        self.dev: dict[str, jax.Array] = {}
        self._queue: Queue = Queue()
        self._thread = None
        self._abort = threading.Event()

    @classmethod
    def create(cls, path: str, budget_points: int | None = None):
        return cls(path, budget_points)

    def load(self, renderer=None):
        if self.state != ResourceState.UNLOADED:
            return
        self.state = ResourceState.LOADING
        n_pad = ((self.total_points + 2**20 - 1) // 2**20) * 2**20
        self.dev = dict(
            xyz4=jnp.zeros(n_pad, jnp.uint32),
            xyz8=jnp.zeros(n_pad, jnp.uint32),
            xyz12=jnp.zeros(n_pad, jnp.uint32),
            rgba=jnp.zeros(n_pad, jnp.uint32),
        )
        self._abort.clear()
        self._thread = threading.Thread(target=self._loader_main, daemon=True)
        self._thread.start()

    def _loader_main(self):
        try:
            idx = 0
            for bn in self.bins:
                if self._abort.is_set():
                    return
                pts_list, rgba_list, node_ids = [], [], []
                for nd in bn:
                    world, rgba = read_node_points(self.path, self.meta, nd)
                    pts_list.append((world - self.las_min).astype(np.float32))
                    rgba_list.append(rgba)
                    node_ids.append(np.full(len(world), idx, np.int64))
                    idx += 1
                self._queue.put(
                    (
                        np.concatenate(pts_list),
                        np.concatenate(rgba_list),
                        np.concatenate(node_ids),
                        idx,
                    )
                )
        except Exception as e:
            self._queue.put(("error", e, None, None))

    def unload(self, renderer=None):
        self.state = ResourceState.UNLOADING
        self._abort.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.dev = {}
        self.nodes_loaded = 0
        self.num_points_loaded = 0
        self.state = ResourceState.UNLOADED

    def process(self, renderer=None, max_bins: int = 1):
        """Upload up to one bin per frame (PotreeData.h:575-605).

        Every upload pads to a multiple of UPLOAD_QUANTUM points so the
        jitted pack/upload programs see a handful of shapes instead of
        one per bin — streaming a 1B-point scene retraced pack_101010
        ~400 times otherwise (77 s frames, all compile).  The padded
        tail lies beyond num_points_loaded, where the per-point node id
        resolves to an unloaded slot (code 0, invisible), and the next
        bin's upload overwrites it.
        """
        for _ in range(max_bins):
            try:
                item = self._queue.get_nowait()
            except Empty:
                break
            if isinstance(item[0], str) and item[0] == "error":
                raise item[1]
            rel, rgba, node_ids, next_loaded = item
            n = len(rel)
            start = self.num_points_loaded
            n_buf = int(self.dev["xyz4"].shape[0])
            pad_n = min(-(-n // UPLOAD_QUANTUM) * UPLOAD_QUANTUM,
                        n_buf - start)
            if pad_n > n:
                rel = np.concatenate([rel, np.zeros((pad_n - n, 3),
                                                    rel.dtype)])
                rgba = np.concatenate([rgba, np.zeros(pad_n - n,
                                                      rgba.dtype)])
                node_ids = np.concatenate(
                    [node_ids, np.full(pad_n - n, node_ids[-1])])
            wmin = self.bbox_min[node_ids]
            wmax = self.bbox_max[node_ids]
            p4, p8, p12, rgba_d = pack_101010(
                jnp.asarray(rel), jnp.asarray(rgba.astype(np.uint32)),
                jnp.asarray(wmin), jnp.asarray(wmax),
            )
            d = self.dev
            d["xyz4"] = _upload_1d(d["xyz4"], start, p4)
            d["xyz8"] = _upload_1d(d["xyz8"], start, p8)
            d["xyz12"] = _upload_1d(d["xyz12"], start, p12)
            d["rgba"] = _upload_1d(d["rgba"], start, rgba_d)
            self.num_points_loaded = start + n
            self.nodes_loaded = next_loaded
        if self.nodes_loaded == len(self.nodes):
            self.state = ResourceState.LOADED

    def wait_loaded(self, renderer=None):
        import time

        self.load(renderer)
        while self.state != ResourceState.LOADED:
            self.process(renderer, max_bins=1000)
            time.sleep(0.01)
        return self
