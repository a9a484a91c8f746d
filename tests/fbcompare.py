"""Framebuffer comparison tolerant to cross-program f32 FMA ULPs.

Two separately-jitted pipelines may contract multiply-adds differently
(excess precision), shifting depth bits by a few ULPs and flipping rare
boundary pixels.  The scatter/merge semantics themselves are asserted
bit-exactly elsewhere (test_raster.test_scatter_u64_min_exact)."""

import numpy as np

EMPTY = 0xFFFFFFFF


def assert_fb_close(got_d, got_p, want_d, want_p, max_flip_frac=0.002):
    got_d = np.asarray(got_d); want_d = np.asarray(want_d)
    got_p = np.asarray(got_p); want_p = np.asarray(want_p)
    both = (got_d != EMPTY) & (want_d != EMPTY)
    either = (got_d != EMPTY) | (want_d != EMPTY)
    flip = either & ~both
    assert either.sum() > 0
    assert flip.sum() <= max(8, max_flip_frac * either.sum()), (
        f"{flip.sum()} coverage flips of {either.sum()}"
    )
    ulp = np.abs(got_d[both].astype(np.int64) - want_d[both].astype(np.int64))
    assert np.median(ulp) == 0
    assert (ulp > 256).mean() < 0.001, f"large depth deviations: {(ulp > 256).mean()}"
    same_d = both & (got_d == want_d)
    agree = (got_p[same_d] == want_p[same_d]).mean()
    assert agree > 0.995, f"payload agreement {agree}"
