"""Minimal dependency-free PNG writer (replaces the reference's stb

screenshot path, Renderer.cpp:94-107)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png_bytes(rgb: np.ndarray) -> bytes:
    """rgb: (H, W, 3) u8 -> PNG file contents."""
    h, w, _ = rgb.shape
    raw = b"".join(
        b"\x00" + rgb[i].astype(np.uint8).tobytes() for i in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def write_png(path: str, rgb: np.ndarray) -> None:
    """rgb: (H, W, 3) u8."""
    with open(path, "wb") as f:
        f.write(write_png_bytes(rgb))
