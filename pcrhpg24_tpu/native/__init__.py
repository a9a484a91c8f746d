"""ctypes bindings for the native codec core (libcodec_core.so).

Falls back to the NumPy implementations when the library is missing;
`build()` compiles it with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libcodec_core.so")
_lib = None


def build() -> str:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO,
         os.path.join(_DIR, "codec_core.cpp")],
        check=True,
    )
    return _SO


def _stale() -> bool:
    """True when the .so is missing or older than codec_core.cpp."""
    if not os.path.exists(_SO):
        return True
    src = os.path.join(_DIR, "codec_core.cpp")
    return os.path.getmtime(src) > os.path.getmtime(_SO)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        try:
            build()
        except Exception:
            if not os.path.exists(_SO):
                return None  # no compiler, no prior build: NumPy fallback
    lib = ctypes.CDLL(_SO)
    lib.encode_native_batch.restype = ctypes.c_int
    lib.encode_native_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.decode_ref_batch.restype = ctypes.c_int
    lib.decode_ref_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.encode_fixed_batch.restype = ctypes.c_int
    lib.encode_fixed_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.transcode_ref_batch.restype = ctypes.c_int
    lib.transcode_ref_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.encode_ref_batch.restype = ctypes.c_int
    lib.encode_ref_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def encode_native_batch_streams(deltas: np.ndarray, bucket_codes, bucket_lens,
                                maxw: int):
    """C++ path of codec/native.py's per-group pack + interleave.

    deltas: (1024, 192) i32.  Returns (streams list of 8 arrays,
    round_ptrs (384,8) i32) or None when maxw too small.
    """
    lib = get_lib()
    deltas = np.ascontiguousarray(deltas, np.int32)
    codes = np.zeros(33, np.uint32)
    lens = np.zeros(33, np.int32)
    codes[: len(bucket_codes)] = bucket_codes
    lens[: len(bucket_lens)] = bucket_lens
    stream = np.zeros((8, maxw), np.uint32)
    group_len = np.zeros(8, np.int32)
    ptrs = np.zeros((384, 8), np.int32)
    rc = lib.encode_native_batch(
        deltas.ctypes.data, codes.ctypes.data, lens.ctypes.data,
        stream.ctypes.data, group_len.ctypes.data, ptrs.ctypes.data,
        maxw,
    )
    if rc != 0:
        return None
    streams = [stream[g, : group_len[g]].copy() for g in range(8)]
    return streams, ptrs


def encode_ref_batch_streams(deltas: np.ndarray, sym_keys, sym_codes, sym_lens):
    """C++ path of codec/batch_codec.py's pack + warp interleave.

    Returns (encoding u32, separate i32, separate_sizes (1024,) i32,
    cluster_sizes (32,) i32)."""
    lib = get_lib()
    deltas = np.ascontiguousarray(deltas, np.int32)
    sym_keys = np.ascontiguousarray(sym_keys, np.int32)
    sym_codes = np.ascontiguousarray(sym_codes, np.uint32)
    sym_lens = np.ascontiguousarray(sym_lens, np.int32)
    cap_enc = 1024 * 192 * 2 + 4096  # 44 bits/sym absolute worst case
    cap_sep = 1024 * 192
    enc = np.zeros(cap_enc, np.uint32)
    sep = np.zeros(cap_sep, np.int32)
    sep_sizes = np.zeros(1024, np.int32)
    cluster = np.zeros(32, np.int32)
    enc_len = ctypes.c_int64()
    sep_len = ctypes.c_int64()
    rc = lib.encode_ref_batch(
        deltas.ctypes.data, sym_keys.ctypes.data, sym_codes.ctypes.data,
        sym_lens.ctypes.data, len(sym_keys), enc.ctypes.data, cap_enc,
        ctypes.byref(enc_len), sep.ctypes.data, cap_sep,
        ctypes.byref(sep_len), sep_sizes.ctypes.data, cluster.ctypes.data,
    )
    assert rc == 0, f"encode_ref_batch failed: {rc}"
    return (
        enc[: enc_len.value].copy(),
        sep[: sep_len.value].copy(),
        sep_sizes,
        cluster,
    )


def decode_ref_batch_deltas(encoding, cluster_sizes, separate, separate_sizes,
                            table_values, table_cw_len):
    """C++ decode of one reference batch -> (1024, 192) i32 deltas."""
    lib = get_lib()
    encoding = np.ascontiguousarray(encoding, np.uint32)
    cluster = np.ascontiguousarray(cluster_sizes, np.int32)
    sep = np.ascontiguousarray(separate, np.int32)
    if sep.size == 0:
        sep = np.zeros(1, np.int32)
    sepsz = np.ascontiguousarray(separate_sizes, np.int32)
    tv = np.ascontiguousarray(table_values, np.int32)
    tl = np.ascontiguousarray(table_cw_len, np.int32)
    out = np.zeros((1024, 192), np.int32)
    rc = lib.decode_ref_batch(
        encoding.ctypes.data, len(encoding), cluster.ctypes.data,
        sep.ctypes.data, sepsz.ctypes.data, tv.ctypes.data, tl.ctypes.data,
        out.ctypes.data,
    )
    assert rc == 0
    return out


def encode_fixed_batch_streams(deltas: np.ndarray, maxw: int):
    """C++ path of codec/fixed.py's pack + uniform-round interleave.

    deltas: (1024, 192) i32.  Returns (streams (8,nwords) u32,
    widths (1024,3) u8, round_ptrs (64,) i32) or None when maxw too
    small."""
    lib = get_lib()
    deltas = np.ascontiguousarray(deltas, np.int32)
    widths = np.zeros((1024, 3), np.uint8)
    stream = np.zeros((8, maxw), np.uint32)
    nwords = ctypes.c_int64()
    ptrs = np.zeros(64, np.int32)
    rc = lib.encode_fixed_batch(
        deltas.ctypes.data, widths.ctypes.data, stream.ctypes.data,
        ctypes.byref(nwords), ptrs.ctypes.data, maxw,
    )
    if rc != 0:
        return None
    return stream[:, : nwords.value].copy(), widths, ptrs


def transcode_ref_batch(b, maxw: int = 16384):
    """Fused C++ decode + fbatch re-encode of one reference batch.

    `b` is a huffman_file batch record.  Returns (streams (8,nwords)
    u32, widths (1024,3) u8, round_ptrs (64,) i32, bbox_min_i (3,) i32,
    bbox_max_i (3,) i32) — the decoded reference deltas ARE the fixed
    codec's chain deltas (same 1024x64 chain structure), so no
    intermediate coordinate materialization happens.
    """
    lib = get_lib()
    encoding = np.ascontiguousarray(b.encoding, np.uint32)
    cluster = np.ascontiguousarray(b.cluster_sizes, np.int32)
    sep = np.ascontiguousarray(b.separate, np.int32)
    if sep.size == 0:
        sep = np.zeros(1, np.int32)
    sepsz = np.ascontiguousarray(b.separate_sizes, np.int32)
    tv = np.ascontiguousarray(b.decoder_values, np.int32)
    tl = np.ascontiguousarray(b.decoder_cw_len, np.int32)
    sv = np.ascontiguousarray(b.start_values, np.int32)
    while True:
        widths = np.zeros((1024, 3), np.uint8)
        stream = np.zeros((8, maxw), np.uint32)
        nwords = ctypes.c_int64()
        ptrs = np.zeros(64, np.int32)
        bbox = np.zeros(6, np.int32)
        rc = lib.transcode_ref_batch(
            encoding.ctypes.data, len(encoding), cluster.ctypes.data,
            sep.ctypes.data, sepsz.ctypes.data, tv.ctypes.data,
            tl.ctypes.data, sv.ctypes.data, widths.ctypes.data,
            stream.ctypes.data, ctypes.byref(nwords), ptrs.ctypes.data,
            bbox.ctypes.data, maxw,
        )
        if rc == 0:
            return (stream[:, : nwords.value].copy(), widths, ptrs,
                    bbox[:3].copy(), bbox[3:].copy())
        maxw *= 2
