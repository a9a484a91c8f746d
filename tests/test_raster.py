"""Rasterizer exactness vs a trivially-correct NumPy u64-atomicMin model.

The scatter stage must match the reference's u64 (depth<<32|payload)
atomicMin bit-for-bit (render.cu:276-303); the projection stage is f32
and may differ from a straight-line NumPy model by FMA-ordering ULPs, so
the full pipeline is checked with a depth tolerance.
"""

import numpy as np
import jax.numpy as jnp

from pcrhpg24_tpu.render.camera import Camera, OrbitControls
from pcrhpg24_tpu.render.raster import EMPTY, rasterize, resolve, scatter_u64_min


def test_scatter_u64_min_exact():
    rng = np.random.default_rng(1)
    n, size = 50_000, 5000
    pid = rng.integers(0, size, n).astype(np.int32)
    depth = rng.integers(0, 1 << 31, n).astype(np.uint32)
    # heavy depth collisions to exercise payload tie-break
    depth = (depth // 1000) * 1000
    payload = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)

    fb = np.full(size, np.uint64(0xFFFFFFFFFFFFFFFF))
    key = (depth.astype(np.uint64) << 32) | payload.astype(np.uint64)
    np.minimum.at(fb, pid, key)

    fb_d, fb_p = scatter_u64_min(
        jnp.asarray(pid), jnp.asarray(depth), jnp.asarray(payload), size
    )
    got = (np.asarray(fb_d, np.uint64) << 32) | np.asarray(fb_p, np.uint64)
    np.testing.assert_array_equal(got, fb)


def naive_raster(positions, payload, transform, width, height):
    """Exact u64 atomicMin model with straight-line f32 projection."""
    n = len(positions)
    h = np.concatenate([positions, np.ones((n, 1), np.float32)], axis=1)
    clip = (h @ np.asarray(transform, np.float32).T).astype(np.float32)
    w = clip[:, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        ndc = clip[:, :2] / w[:, None]
    ok = (w > 0) & (np.abs(ndc[:, 0]) <= 1) & (np.abs(ndc[:, 1]) <= 1)
    px = ((ndc[:, 0] * 0.5 + 0.5) * width).astype(np.int64)
    py = ((ndc[:, 1] * 0.5 + 0.5) * height).astype(np.int64)
    ok &= (px >= 0) & (px < width) & (py >= 0) & (py < height)
    depth = w.view(np.uint32).astype(np.uint64)
    key = (depth << 32) | payload.astype(np.uint64)
    fb = np.full(width * height, 0xFFFFFFFFFFFFFFFF, np.uint64)
    pid = px + py * width
    np.minimum.at(fb, pid[ok], key[ok])
    return fb


def test_raster_pipeline_close():
    rng = np.random.default_rng(0)
    n = 20000
    W, H = 160, 90
    pos = rng.random((n, 3)).astype(np.float32) * [100, 100, 30]
    payload = rng.integers(0, 1 << 24, n).astype(np.uint32)
    dup = rng.integers(0, n, 5000)
    pos = np.concatenate([pos, pos[dup]])
    payload = np.concatenate([payload, rng.integers(0, 1 << 24, 5000).astype(np.uint32)])

    controls = OrbitControls(
        yaw=0.3, pitch=-0.6, radius=150.0, target=np.array([50.0, 50.0, 15.0])
    )
    cam = Camera(width=W, height=H)
    cam.world = controls.world()
    T = cam.view_proj()

    fb_ref = naive_raster(pos, payload, T, W, H)
    fb_d, fb_p = rasterize(
        jnp.asarray(pos), jnp.asarray(payload), jnp.asarray(T, jnp.float32), W, H
    )
    d = np.asarray(fb_d)
    p = np.asarray(fb_p)
    ref_d = (fb_ref >> 32).astype(np.uint32)
    ref_p = (fb_ref & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    hit = ref_d != 0xFFFFFFFF
    assert hit.sum() > 1000
    # depth bits within a few ULPs of the straight-line model
    both = hit & (d != 0xFFFFFFFF)
    ulp = np.abs(d[both].astype(np.int64) - ref_d[both].astype(np.int64))
    assert np.median(ulp) == 0
    assert (ulp > 64).mean() < 0.01
    # payloads identical on pixels where the depth winner is unambiguous
    same_d = both & (d == ref_d)
    frac_payload_same = (p[same_d] == ref_p[same_d]).mean()
    assert frac_payload_same > 0.98


def test_resolve_background():
    W, H = 8, 4
    fbp = jnp.full((W * H,), EMPTY, jnp.uint32).at[5].set(jnp.uint32(0x00112233))
    img = np.asarray(resolve(fbp, W, H))
    assert img[0, 5] == 0x00112233
    assert img[1, 1] == 0x00443322


def test_edl_shade_flat_and_edge():
    """EDL (resolve.cs:143-188 semantics): flat depth -> unchanged;
    at a step edge only the FAR side darkens; background untouched."""
    import jax.numpy as jnp

    from pcrhpg24_tpu.render.raster import EMPTY, edl_shade

    W, H = 16, 8
    img = np.full((H, W), 0x00808080, np.uint32)
    # flat plane depth 10.0 everywhere
    d = np.full(H * W, np.float32(10.0).view(np.uint32).item(), np.uint32)
    out = np.asarray(edl_shade(jnp.asarray(img), jnp.asarray(d), W, H))
    np.testing.assert_array_equal(out, img)

    # left half depth 10, right half depth 40; one background pixel
    dv = np.full((H, W), 10.0, np.float32)
    dv[:, W // 2:] = 40.0
    db = dv.view(np.uint32).copy()
    db[0, 0] = EMPTY
    img[0, 0] = 0x00443322
    out = np.asarray(edl_shade(jnp.asarray(img), jnp.asarray(db.reshape(-1)),
                               W, H))
    assert out[0, 0] == 0x00443322  # background kept
    # far side of the edge darkens, near side does not
    assert (out[2, W // 2] & 0xFF) < 0x80
    assert out[2, W // 2 - 1] == 0x00808080
    # interior of the far half (no nearer neighbor) unchanged
    assert out[2, W // 2 + 2] == 0x00808080
