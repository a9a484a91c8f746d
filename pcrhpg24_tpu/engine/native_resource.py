"""Streaming `.tpc` (TPU-native) scene resource.

Same state machine and streaming scheme as HuffmanLasData (see
resource.py), but the device layout feeds the Pallas tbatch decoder:
per-batch dense rows (streams padded to the scene's max group width,
canonical-code tables, round pointers, start values, BC1 colors).
"""

from __future__ import annotations

import threading
from queue import Empty, Queue

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    RENDER_CHUNK_BATCHES,
    TPU_GROUPS_PER_BATCH,
    TPU_MAX_CODE_LEN,
    WORKGROUP_SIZE,
)
from ..formats.native_file import read_tpc_batch, read_tpc_header
from .resource import Resource, ResourceState, _upload_rows

G = TPU_GROUPS_PER_BATCH
MAXL = TPU_MAX_CODE_LEN


class NativeLasData(Resource):
    BATCHES_PER_TASK = 100

    def __init__(self, path: str):
        self.path = path
        self.header = read_tpc_header(path)
        self.num_points = self.header.num_points
        self.num_batches = self.header.num_batches
        self.num_batches_loaded = 0
        self.num_points_loaded = 0
        self.version = self.header.version
        self.color_fmt = getattr(self.header, "color_fmt", "bc1")
        self.maxw = ((self.header.max_group_words + 127) // 128 + 2) * 128
        self.maxt = (self.header.max_group_words + 127) // 128 + 4
        self.dev: dict[str, jax.Array] = {}
        self.scale = np.asarray(self.header.scale)
        self.offset = np.asarray(self.header.offset)
        self.las_min = np.asarray(self.header.las_min)
        self.bbox_min = np.zeros((self.num_batches, 3), np.float32)
        self.bbox_max = np.zeros((self.num_batches, 3), np.float32)
        from ..render.methods.huffman_tpu import CHUNK as _NCHUNK
        b_pad = -(-self.num_batches // _NCHUNK) * _NCHUNK
        # per-batch i32 anchors for batch-relative (f64-precision) projection
        self.anchor_i = np.zeros((b_pad, 3), np.int64)
        self._queue: Queue = Queue()
        self._thread = None
        self._abort = threading.Event()

    @classmethod
    def create(cls, path: str) -> "NativeLasData":
        return cls(path)

    def load(self, renderer=None):
        if self.state != ResourceState.UNLOADED:
            return
        self.state = ResourceState.LOADING
        from ..render.methods.huffman_tpu import CHUNK as _NCHUNK
        B = -(-self.num_batches // _NCHUNK) * _NCHUNK
        if self.version == 2:
            from ..formats.native_file import COLOR_WORDS

            self.dev = dict(
                widths=jnp.zeros((B, 3, G, 128), jnp.int32),
                streams=jnp.zeros((B, self.maxt, G, 128), jnp.uint32),
                ptrs=jnp.zeros((B, 1, 64), jnp.int32),
                starts=jnp.zeros((B, 3, G, 128), jnp.int32),
                colors=jnp.zeros((B, COLOR_WORDS[self.color_fmt]),
                                 jnp.uint32),
                bbox_min=jnp.zeros((B, 3), jnp.float32),
                bbox_max=jnp.zeros((B, 3), jnp.float32),
                anchor=jnp.zeros((B, 3), jnp.int32),
            )
            if self.color_fmt == "bc1":
                # BC1 blocks in the project kernel's layout (block, word,
                # g, lane) — render/pallas_project.py; the fused
                # project+BC1 kernel only exists for BC1 (the reference's
                # default COLOR_COMPRESSION; other formats decode color
                # on the XLA projection path)
                self.dev["colors_k"] = jnp.zeros((B, 4, 2, G, 128),
                                                 jnp.uint32)
        else:
            self.dev = dict(
                lj=jnp.zeros((B, 1, 32), jnp.int32),
                streams=jnp.zeros((B, G, self.maxw), jnp.uint32),
                ptrs=jnp.zeros((B, 384, G), jnp.int32),
                dD=jnp.zeros((B, 1, 128), jnp.int32),
                lut=jnp.zeros((B, 1, 128), jnp.int32),
                starts=jnp.zeros((B, 3, G, 128), jnp.int32),
                colors=jnp.zeros((B, WORKGROUP_SIZE * 64 // 8), jnp.uint32),
                bbox_min=jnp.zeros((B, 3), jnp.float32),
                bbox_max=jnp.zeros((B, 3), jnp.float32),
                anchor=jnp.zeros((B, 3), jnp.int32),
            )
        self._abort.clear()
        self._thread = threading.Thread(target=self._loader_main, daemon=True)
        self._thread.start()

    def _loader_main(self):
        try:
            for start in range(0, self.num_batches, self.BATCHES_PER_TASK):
                if self._abort.is_set():
                    return
                end = min(start + self.BATCHES_PER_TASK, self.num_batches)
                items = [read_tpc_batch(self.path, self.header, i) for i in range(start, end)]
                self._queue.put((start, items))
        except Exception as e:
            self._queue.put(("error", e))

    def unload(self, renderer=None):
        self.state = ResourceState.UNLOADING
        self._abort.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.dev = {}
        self.num_batches_loaded = 0
        self.num_points_loaded = 0
        self.state = ResourceState.UNLOADED

    def process(self, renderer=None, max_tasks: int = 8):
        if self.version == 2:
            from ..render.pallas_decode_fixed import pack_fixed_batches as _pack
            keys = ("widths", "streams", "ptrs", "starts")
            packed_kw = dict(maxt=self.maxt)
        else:
            from ..render.pallas_decode import pack_native_batches as _pack
            keys = ("lj", "streams", "ptrs", "dD", "lut", "starts")
            packed_kw = dict(maxw=self.maxw)

        for _ in range(max_tasks):
            try:
                item = self._queue.get_nowait()
            except Empty:
                break
            if item[0] == "error":
                raise item[1]
            start, items = item
            nbs = [nb for nb, _c in items]
            packed = _pack(nbs, **packed_kw)
            d = self.dev
            for key in keys:
                d[key] = _upload_rows(d[key], start, jnp.asarray(packed[key]))
            colors = np.stack([c for _nb, c in items]).astype(np.uint32)
            d["colors"] = _upload_rows(d["colors"], start, jnp.asarray(colors))
            if self.version == 2 and self.color_fmt == "bc1":
                from ..render.pallas_project import colors_kernel_layout

                d["colors_k"] = _upload_rows(
                    d["colors_k"], start,
                    jnp.asarray(colors_kernel_layout(colors)),
                )
            # component-wise chain-start minimum: identical for the same
            # batch across formats, so the XLA .huffman path and this one
            # produce bit-identical projections (tests/fbcompare)
            anchors = np.stack([
                np.asarray(nb.start_values).reshape(-1, 3).min(axis=0)
                for nb, _c in items
            ]).astype(np.int64)
            self.anchor_i[start : start + len(items)] = anchors
            d["anchor"] = _upload_rows(
                d["anchor"], start, jnp.asarray(anchors.astype(np.int32))
            )
            for i, (nb, _c) in enumerate(items):
                bmin = nb.bbox_min_i.astype(np.float64) * self.scale + self.offset
                bmax = nb.bbox_max_i.astype(np.float64) * self.scale + self.offset
                self.bbox_min[start + i] = (bmin - self.las_min).astype(np.float32)
                self.bbox_max[start + i] = (bmax - self.las_min).astype(np.float32)
            d["bbox_min"] = _upload_rows(
                d["bbox_min"], start,
                jnp.asarray(self.bbox_min[start : start + len(items)]),
            )
            d["bbox_max"] = _upload_rows(
                d["bbox_max"], start,
                jnp.asarray(self.bbox_max[start : start + len(items)]),
            )
            self.num_batches_loaded = max(self.num_batches_loaded, start + len(items))
            self.num_points_loaded = self.num_batches_loaded * WORKGROUP_SIZE * 64
        if self.num_batches_loaded == self.num_batches:
            self.state = ResourceState.LOADED

    def wait_loaded(self, renderer=None):
        import time

        self.load(renderer)
        while self.state != ResourceState.LOADED:
            self.process(renderer, max_tasks=1_000_000)
            time.sleep(0.01)
        return self
