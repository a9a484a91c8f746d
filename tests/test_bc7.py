"""BC7 mode-6 codec: encode/decode roundtrip quality + layout checks."""

import numpy as np

from pcrhpg24_tpu.codec.bc7 import decode_bc7, encode_bc7


def test_bc7_roundtrip_quality():
    rng = np.random.default_rng(0)
    n = 16 * 256
    # smooth-ish block content (BC is designed for gradients)
    base = rng.integers(0, 200, (n // 16, 1, 3))
    grad = np.linspace(0, 55, 16).astype(int)[None, :, None]
    rgb = np.clip(base + grad + rng.integers(-6, 6, (n // 16, 16, 3)), 0, 255)
    rgb = rgb.reshape(n, 3).astype(np.uint32)
    colors = rgb[:, 0] | (rgb[:, 1] << 8) | (rgb[:, 2] << 16)

    enc = encode_bc7(colors)
    assert enc.shape == (n // 16 * 4,)  # 1 B/point (reference accounting)
    dec = decode_bc7(enc, np.arange(n))
    got = np.stack([dec & 255, (dec >> 8) & 255, (dec >> 16) & 255], -1).astype(int)
    mae = np.abs(got - rgb.astype(int)).mean()
    assert mae < 6.0, f"BC7 MAE too high: {mae}"


def test_bc7_mode_bits():
    colors = np.full(16, 0x00112233, np.uint32)
    enc = encode_bc7(colors)
    assert enc[0] & 0x7F == 0x40  # mode 6 marker
    dec = decode_bc7(enc, np.arange(16))
    got = np.stack([dec & 255, (dec >> 8) & 255, (dec >> 16) & 255], -1)
    want = np.array([0x33, 0x22, 0x11])
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2
