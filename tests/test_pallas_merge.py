"""dense_from_sorted (scatter-free fb construction) vs the scatter path.

The kernel must reproduce sorted_resolve_u64_min bit-exactly: same
u64-min winner per pixel (reference semantics: render.cu:276-303's
atomicMin), EMPTY elsewhere, OOB entries dropped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted
from pcrhpg24_tpu.render.raster import sorted_resolve_u64_min

SIZE = 49_152  # 48 tiles of 1024


def _mk(n, seed, oob_frac=0.4, collide=True):
    rng = np.random.default_rng(seed)
    pid = rng.integers(0, SIZE, n).astype(np.uint32)
    pid[rng.random(n) < oob_frac] = SIZE
    if collide:
        pid[: n // 4] = pid[n // 2 : n // 2 + n // 4]
    dep = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    pay = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(pay)


@pytest.mark.parametrize("need_depth", [True, False])
def test_merge_matches_scatter(need_depth):
    pid, dep, pay = _mk(16 * 1024, seed=3)
    ref_d, ref_p = sorted_resolve_u64_min(pid, dep, pay, SIZE, True)
    spid, sdep, spay = jax.lax.sort([pid, dep, pay], num_keys=3)
    got_d, got_p = dense_from_sorted(
        spid, sdep, spay, SIZE, need_depth, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    if need_depth:
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))
    else:
        assert got_d is None


def test_merge_depth_ties_break_by_payload():
    # identical pid+depth, different payloads: smallest payload must win
    pid = jnp.asarray(np.full(1024, 7, np.uint32))
    dep = jnp.asarray(np.full(1024, 0x40000000, np.uint32))
    pay = jnp.asarray(np.arange(1024, 0, -1, dtype=np.uint32))
    spid, sdep, spay = jax.lax.sort([pid, dep, pay], num_keys=3)
    _d, p = dense_from_sorted(spid, sdep, spay, SIZE, False, interpret=True)
    assert int(np.asarray(p)[7]) == 1


def test_merge_all_oob_and_empty_tiles():
    pid = jnp.asarray(np.full(2048, SIZE, np.uint32))
    dep = jnp.asarray(np.zeros(2048, np.uint32))
    pay = jnp.asarray(np.zeros(2048, np.uint32))
    d, p = dense_from_sorted(pid, dep, pay, SIZE, True, interpret=True)
    assert (np.asarray(p) == 0xFFFFFFFF).all()
    assert (np.asarray(d) == 0xFFFFFFFF).all()
