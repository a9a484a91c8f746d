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


# ------------------------- v2: nk1-sorted stream -------------------------


@pytest.mark.parametrize("seed,oob", [(3, 0.4), (4, 0.0), (5, 0.95)])
def test_merge_nk1_matches_scatter(seed, oob):
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_nk1

    pid, dep, pay = _mk(16 * 1024, seed=seed, oob_frac=oob)
    ref_d, ref_p = sorted_resolve_u64_min(pid, dep, pay, SIZE, True)
    # single-key sort: depth/payload arrive in arbitrary order per run
    spid, sdep, spay = jax.lax.sort([pid, dep, pay], num_keys=1,
                                    is_stable=False)
    got_d, got_p = dense_from_sorted_nk1(
        spid, sdep, spay, SIZE, True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_merge_nk1_heavy_collisions_and_ties():
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_nk1

    rng = np.random.default_rng(9)
    n = 8192
    # everything lands on 5 pixels spanning a tile border; depth ties
    # with differing payloads must break by payload min
    pid = rng.choice([1022, 1023, 1024, 1025, 40000], n).astype(np.uint32)
    dep = rng.integers(0, 4, n).astype(np.uint32)
    pay = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    ref_d, ref_p = sorted_resolve_u64_min(
        jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(pay), SIZE, True
    )
    spid, sdep, spay = jax.lax.sort(
        [jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(pay)],
        num_keys=1, is_stable=False,
    )
    got_d, got_p = dense_from_sorted_nk1(
        spid, sdep, spay, SIZE, True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_hqs_sums_from_sorted_matches_scatter_add():
    """Segmented suffix-sum kernel == direct per-pixel accumulation,
    including the reference depth-tolerance accept (render.cu:296)."""
    from pcrhpg24_tpu.render.pallas_hqs import hqs_sums_from_sorted

    rng = np.random.default_rng(11)
    n = 16 * 1024
    pid = rng.integers(0, SIZE, n).astype(np.uint32)
    pid[rng.random(n) < 0.3] = SIZE
    # heavy collisions incl. a whole-window single run
    pid[:2048] = 777
    w = (rng.random(n).astype(np.float32) * 100 + 1).astype(np.float32)
    dep = w.view(np.uint32)
    rgba = rng.integers(0, 2**24, n, dtype=np.uint64).astype(np.uint32)

    # dense depth plane: per-pixel min depth (EMPTY elsewhere)
    fbd = np.full(SIZE, 0xFFFFFFFF, np.uint32)
    for i in range(n):
        if pid[i] < SIZE:
            fbd[pid[i]] = min(fbd[pid[i]], dep[i])

    accs = np.zeros((4, SIZE), np.uint32)
    old = fbd.view(np.float32)
    for i in range(n):
        p = pid[i]
        if p < SIZE and w[i] <= old[p] * np.float32(1.01):
            accs[0, p] += rgba[i] & 0xFF
            accs[1, p] += (rgba[i] >> 8) & 0xFF
            accs[2, p] += (rgba[i] >> 16) & 0xFF
            accs[3, p] += 1

    spid, sdep, spay = jax.lax.sort(
        [jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(rgba)],
        num_keys=1, is_stable=False,
    )
    got = hqs_sums_from_sorted(
        spid, sdep, spay, jnp.asarray(fbd), SIZE, interpret=True
    )
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(got[k]), accs[k])


def test_merge_nk1_multi_stream_matches_global():
    """Per-chunk sorted streams must resolve exactly like one global
    sort (the frame sorts each render chunk independently)."""
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_nk1_multi

    parts = []
    allp = []
    for seed in (3, 4, 5):
        pid, dep, pay = _mk(8 * 1024, seed=seed, oob_frac=0.3)
        allp.append((pid, dep, pay))
        parts.append(tuple(jax.lax.sort([pid, dep, pay], num_keys=1,
                                        is_stable=False)))
    ref_d, ref_p = sorted_resolve_u64_min(
        jnp.concatenate([p for p, _, _ in allp]),
        jnp.concatenate([d for _, d, _ in allp]),
        jnp.concatenate([y for _, _, y in allp]),
        SIZE, True,
    )
    got_d, got_p = dense_from_sorted_nk1_multi(parts, SIZE, True,
                                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_hqs_sums_multi_stream_matches_single():
    """Per-chunk sorted streams must accumulate exactly like one
    globally sorted stream."""
    from pcrhpg24_tpu.render.pallas_hqs import (
        hqs_sums_from_sorted, hqs_sums_from_sorted_multi,
    )

    rng = np.random.default_rng(13)
    chunks = []
    for seed in (1, 2):
        n = 8 * 1024
        pid = rng.integers(0, SIZE, n).astype(np.uint32)
        pid[rng.random(n) < 0.2] = SIZE
        w = (rng.random(n).astype(np.float32) * 50 + 1)
        rgba = rng.integers(0, 2**24, n, dtype=np.uint64).astype(np.uint32)
        chunks.append((pid, w.view(np.uint32), rgba))
    allp = np.concatenate([c[0] for c in chunks])
    alld = np.concatenate([c[1] for c in chunks])
    ally = np.concatenate([c[2] for c in chunks])
    fbd = np.full(SIZE, 0xFFFFFFFF, np.uint32)
    for p, d in zip(allp, alld):
        if p < SIZE:
            fbd[p] = min(fbd[p], d)
    fbd_j = jnp.asarray(fbd)

    sg = jax.lax.sort([jnp.asarray(allp), jnp.asarray(alld),
                       jnp.asarray(ally)], num_keys=1, is_stable=False)
    ref = hqs_sums_from_sorted(*sg, fbd_j, SIZE, interpret=True)

    parts = [tuple(jax.lax.sort(
        [jnp.asarray(p), jnp.asarray(d), jnp.asarray(y)],
        num_keys=1, is_stable=False)) for p, d, y in chunks]
    got = hqs_sums_from_sorted_multi(parts, fbd_j, SIZE, interpret=True)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))



def test_grouped_resolve_matches_single(monkeypatch):
    """Shrink the SMEM word budget so 3 streams split into groups; the
    grouped u64-min combine and the grouped HQS sums must equal the
    single-call results exactly (exercises the >200M-point path)."""
    import pcrhpg24_tpu.render.pallas_merge as pm
    from pcrhpg24_tpu.render.pallas_hqs import hqs_sums_from_sorted_multi

    parts = []
    allp = []
    for seed in (3, 4, 5):
        pid, dep, pay = _mk(8 * 1024, seed=seed, oob_frac=0.3)
        allp.append((pid, dep, pay))
        parts.append(tuple(jax.lax.sort([pid, dep, pay], num_keys=1,
                                        is_stable=False)))
    ref_d, ref_p = pm.dense_from_sorted_nk1_multi(parts, SIZE, True,
                                                  interpret=True)
    ntiles_pad = (-(-SIZE // pm.TILE) // pm.TPS + (
        1 if (-(-SIZE // pm.TILE)) % pm.TPS else 0)) * pm.TPS
    assert len(pm.group_streams(parts, ntiles_pad, budget=60)) > 1
    monkeypatch.setattr(pm, "_SMEM_WORD_BUDGET", 60)
    # the jit cache key doesn't include the module global: drop it so
    # the grouped trace actually happens
    pm.dense_from_sorted_nk1_multi.clear_cache()
    got_d, got_p = pm.dense_from_sorted_nk1_multi(parts, SIZE, True,
                                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))

    fbd = ref_d  # dense min-depth plane for the tolerance gate
    monkeypatch.setattr(pm, "_SMEM_WORD_BUDGET", 10**9)
    hqs_sums_from_sorted_multi.clear_cache()
    ref_sums = hqs_sums_from_sorted_multi(parts, fbd, SIZE, interpret=True)
    monkeypatch.setattr(pm, "_SMEM_WORD_BUDGET", 60)
    hqs_sums_from_sorted_multi.clear_cache()
    got_sums = hqs_sums_from_sorted_multi(parts, fbd, SIZE, interpret=True)
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(got_sums[k]), np.asarray(ref_sums[k])
        )
    pm.dense_from_sorted_nk1_multi.clear_cache()
    hqs_sums_from_sorted_multi.clear_cache()


def test_group_streams_edges():
    """Grouping is shape-only: singleton stays one group; the budget
    boundary is inclusive; a lone oversized part still forms a group."""
    from pcrhpg24_tpu.render.pallas_merge import TILE, group_streams

    mk = lambda n: (jnp.zeros(n, jnp.uint32),) * 3
    ntp = 48
    # one part: always a single group, even if over budget
    assert len(group_streams([mk(8 * TILE)], ntp, budget=1)) == 1
    # words per part = ntp + n/TILE = 48 + 8 = 56; budget 112 fits two
    g = group_streams([mk(8 * TILE)] * 4, ntp, budget=112)
    assert [len(x) for x in g] == [2, 2]
    # inclusive boundary: 3 parts at budget 168 = exactly 3*56
    g = group_streams([mk(8 * TILE)] * 3, ntp, budget=168)
    assert [len(x) for x in g] == [3]


# ------------------- v3: equal-width sorted rows (streams) -------------------


@pytest.mark.parametrize("rows,oob", [(4, 0.4), (16, 0.0), (8, 0.9)])
def test_merge_rows_matches_scatter(rows, oob):
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows

    pid, dep, pay = _mk(16 * 1024, seed=rows, oob_frac=oob)
    ref_d, ref_p = sorted_resolve_u64_min(pid, dep, pay, SIZE, True)
    n = pid.shape[0] // rows
    sp, sd, sy = jax.lax.sort(
        [pid.reshape(rows, n), dep.reshape(rows, n), pay.reshape(rows, n)],
        num_keys=1, is_stable=False, dimension=1,
    )
    got_d, got_p = dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@pytest.mark.parametrize("rows,oob", [(4, 0.4), (8, 0.9)])
def test_merge_rows_fully_sorted(rows, oob):
    """nk3-sorted rows + fully_sorted=True (suffix_steps=0) must match
    the scatter path exactly — the flagship's production configuration
    (pallas_merge.SORT_KEYS == 3)."""
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows

    pid, dep, pay = _mk(16 * 1024, seed=rows + 100, oob_frac=oob)
    ref_d, ref_p = sorted_resolve_u64_min(pid, dep, pay, SIZE, True)
    n = pid.shape[0] // rows
    sp, sd, sy = jax.lax.sort(
        [pid.reshape(rows, n), dep.reshape(rows, n), pay.reshape(rows, n)],
        num_keys=3, is_stable=False, dimension=1,
    )
    got_d, got_p = dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                          interpret=True, fully_sorted=True)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@pytest.mark.parametrize("rows,oob,nk", [(4, 0.4, 3), (8, 0.9, 3),
                                         (8, 0.3, 1)])
def test_merge_rows_pay_bits_24(rows, oob, nk):
    """pay_bits=24 (the flagship BC1 payload contract) must match the
    scatter path bit-for-bit when every payload < 2**24, on both the
    fully-sorted (nk3) and the suffix-min (nk1) kernel paths."""
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows

    pid, dep, pay = _mk(16 * 1024, seed=rows + 200, oob_frac=oob)
    pay = pay & jnp.uint32(0x00FFFFFF)
    ref_d, ref_p = sorted_resolve_u64_min(pid, dep, pay, SIZE, True)
    n = pid.shape[0] // rows
    sp, sd, sy = jax.lax.sort(
        [pid.reshape(rows, n), dep.reshape(rows, n), pay.reshape(rows, n)],
        num_keys=nk, is_stable=False, dimension=1,
    )
    got_d, got_p = dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                          interpret=True,
                                          fully_sorted=nk == 3,
                                          pay_bits=24)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_merge_rows_pay_bits_0_depth_plane():
    """pay_bits=0 (HQS prepass) drops every payload plane; the returned
    depth plane must still be the exact per-pixel min depth (payload
    tie-breaks never change the u64 min's depth component)."""
    from pcrhpg24_tpu.render.pallas_merge import dense_from_sorted_rows

    pid, dep, pay = _mk(16 * 1024, seed=7, oob_frac=0.4)
    ref_d, _ref_p = sorted_resolve_u64_min(pid, dep, pay, SIZE, True)
    rows = 8
    n = pid.shape[0] // rows
    sp, sd, sy = jax.lax.sort(
        [pid.reshape(rows, n), dep.reshape(rows, n), pay.reshape(rows, n)],
        num_keys=3, is_stable=False, dimension=1,
    )
    got_d, _got_p = dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                           interpret=True,
                                           fully_sorted=True, pay_bits=0)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@pytest.mark.parametrize("runlen", ["bound", "bound+1", 300])
def test_merge_rows_run_bound_branches(runlen):
    """The lax.cond between the fast (run <= 2**FAST_SUFFIX_STEPS) and
    full suffix-min kernels must be exact on either side of the
    boundary, whatever the configured fast depth."""
    import pcrhpg24_tpu.render.pallas_merge as pm

    bound = 1 << pm.FAST_SUFFIX_STEPS
    runlen = {"bound": bound, "bound+1": bound + 1}.get(runlen, runlen)

    rng = np.random.default_rng(runlen)
    rows, n = 4, 4096  # noqa
    pid = rng.integers(0, SIZE, rows * n).astype(np.uint32)
    pid[:runlen] = 2000  # run of exactly `runlen` once sorted to row 0
    pid[(pid >= 1990) & (pid <= 2010) & (np.arange(rows * n) >= runlen)] = 0
    dep = rng.integers(0, 2**31, rows * n, dtype=np.uint64).astype(np.uint32)
    pay = rng.integers(0, 2**24, rows * n, dtype=np.uint64).astype(np.uint32)
    ref_d, ref_p = sorted_resolve_u64_min(
        jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(pay), SIZE, True)
    sp, sd, sy = jax.lax.sort(
        [jnp.asarray(pid.reshape(rows, n)), jnp.asarray(dep.reshape(rows, n)),
         jnp.asarray(pay.reshape(rows, n))],
        num_keys=1, is_stable=False, dimension=1,
    )
    assert bool(pm._runs_bounded(sp, SIZE)) == (runlen <= bound)
    got_d, got_p = pm.dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@pytest.mark.parametrize("span_tiles,tile_cols,expect_clipped",
                         [(6, None, True), (47, None, False),
                          (6, 8, True)])
def test_merge_rows_clipped_build_matches_scatter(monkeypatch, span_tiles,
                                                  tile_cols,
                                                  expect_clipped):
    """The clipped pair-grid table build (and its fits-check cond) must
    produce the exact scatter winners; a row spanning more tiles than
    the clip must take the full-grid branch and still be exact.
    tile_cols=8 exercises the 2D tile-box clip (48 tiles as an 8x6
    grid): spans of 6 consecutive ids cross grid rows, so boxes are
    genuinely 2D."""
    import pcrhpg24_tpu.render.pallas_merge as pm

    rng = np.random.default_rng(span_tiles)
    rows, n = 8, 4096
    pid = np.empty((rows, n), np.uint32)
    for s in range(rows):
        base = (s * 5 % 40) * 1024
        v = base + rng.integers(0, span_tiles * 1024, n).astype(np.uint32)
        v[rng.random(n) < 0.3] = SIZE
        pid[s] = v
    dep = rng.integers(0, 2**31, (rows, n), dtype=np.uint64).astype(np.uint32)
    pay = rng.integers(0, 2**24, (rows, n), dtype=np.uint64).astype(np.uint32)
    ref_d, ref_p = sorted_resolve_u64_min(
        jnp.asarray(pid.reshape(-1)), jnp.asarray(dep.reshape(-1)),
        jnp.asarray(pay.reshape(-1)), SIZE, True)
    sp, sd, sy = jax.lax.sort(
        [jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(pay)],
        num_keys=1, is_stable=False, dimension=1,
    )
    clip = 8 if tile_cols is None else 16
    monkeypatch.setattr(pm, "CLIP_TILES", clip)
    assert bool(pm._clip_fits(sp, SIZE, clip, tile_cols)) == expect_clipped
    pm.dense_from_sorted_rows.clear_cache()
    got_d, got_p = pm.dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                             interpret=True,
                                             tile_cols=tile_cols)
    pm.dense_from_sorted_rows.clear_cache()
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_hqs_rows_clipped_build_matches_scatter_add(monkeypatch):
    """Clipped table build under the HQS suffix-sum kernel: every
    tolerance-passing entry must be counted exactly once."""
    import pcrhpg24_tpu.render.pallas_merge as pm
    from pcrhpg24_tpu.render import pallas_hqs as ph

    rng = np.random.default_rng(11)
    rows, n = 6, 4096
    pid = np.empty((rows, n), np.uint32)
    for s in range(rows):
        base = (s * 7 % 40) * 1024
        v = base + rng.integers(0, 5 * 1024, n).astype(np.uint32)
        v[rng.random(n) < 0.25] = SIZE
        pid[s] = v
    pidf = pid.reshape(-1)
    w = (rng.random(rows * n).astype(np.float32) * 100 + 1)
    dep = w.view(np.uint32)
    rgba = rng.integers(0, 2**24, rows * n, dtype=np.uint64).astype(np.uint32)
    fbd = np.full(SIZE, 0xFFFFFFFF, np.uint32)
    np.minimum.at(fbd, pidf[pidf < SIZE], dep[pidf < SIZE])
    old = fbd.view(np.float32)
    accs = np.zeros((4, SIZE), np.uint64)
    keep = (pidf < SIZE) & (w <= old[np.minimum(pidf, SIZE - 1)]
                            * np.float32(1.01))
    for a, c in zip(accs, (rgba & 0xFF, (rgba >> 8) & 0xFF,
                           (rgba >> 16) & 0xFF, np.ones_like(rgba))):
        np.add.at(a, pidf[keep], c[keep].astype(np.uint64))

    sp, sd, sy = jax.lax.sort(
        [jnp.asarray(pid), jnp.asarray(dep.reshape(rows, n)),
         jnp.asarray(rgba.reshape(rows, n))],
        num_keys=1, is_stable=False, dimension=1,
    )
    monkeypatch.setattr(pm, "CLIP_TILES", 8)
    assert bool(pm._clip_fits(sp, SIZE, 8))
    ph.hqs_sums_from_rows.clear_cache()
    got = ph.hqs_sums_from_rows(sp, sd, sy, jnp.asarray(fbd), SIZE,
                                interpret=True)
    ph.hqs_sums_from_rows.clear_cache()
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(got[k]), accs[k].astype(np.uint32)
        )


def test_merge_rows_grouped_equals_single(monkeypatch):
    """SMEM grouping (small budget) must not change any winner."""
    import pcrhpg24_tpu.render.pallas_merge as pm

    pid, dep, pay = _mk(32 * 1024, seed=77, oob_frac=0.3)
    rows, n = 16, (32 * 1024) // 16
    sp, sd, sy = jax.lax.sort(
        [pid.reshape(rows, n), dep.reshape(rows, n), pay.reshape(rows, n)],
        num_keys=1, is_stable=False, dimension=1,
    )
    ref_d, ref_p = pm.dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                             interpret=True)
    pm.dense_from_sorted_rows.clear_cache()
    monkeypatch.setattr(pm, "_SMEM_WORD_BUDGET", 200)
    got_d, got_p = pm.dense_from_sorted_rows(sp, sd, sy, SIZE, True,
                                             interpret=True)
    pm.dense_from_sorted_rows.clear_cache()
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_hqs_sums_from_rows_matches_scatter_add():
    """Rows variant of the HQS suffix-sum kernel == direct per-pixel
    accumulation with the reference tolerance gate (render.cu:296) —
    including stream-end clamp re-reads (short last rows) and heavy
    single-pixel runs spanning windows."""
    from pcrhpg24_tpu.render.pallas_hqs import hqs_sums_from_rows

    rng = np.random.default_rng(21)
    rows, n = 12, 4096
    pid = rng.integers(0, SIZE, rows * n).astype(np.uint32)
    pid[rng.random(rows * n) < 0.3] = SIZE
    pid[:6000] = 777  # giant run crossing window borders in row 0
    w = (rng.random(rows * n).astype(np.float32) * 100 + 1)
    dep = w.view(np.uint32)
    rgba = rng.integers(0, 2**24, rows * n, dtype=np.uint64).astype(np.uint32)

    fbd = np.full(SIZE, 0xFFFFFFFF, np.uint32)
    np.minimum.at(fbd, pid[pid < SIZE], dep[pid < SIZE])
    old = fbd.view(np.float32)
    accs = np.zeros((4, SIZE), np.uint64)
    keep = (pid < SIZE) & (w <= old[np.minimum(pid, SIZE - 1)] * np.float32(1.01))
    for a, c in zip(accs, (rgba & 0xFF, (rgba >> 8) & 0xFF,
                           (rgba >> 16) & 0xFF, np.ones_like(rgba))):
        np.add.at(a, pid[keep], c[keep].astype(np.uint64))

    sp, sd, sy = jax.lax.sort(
        [jnp.asarray(pid.reshape(rows, n)),
         jnp.asarray(dep.reshape(rows, n)),
         jnp.asarray(rgba.reshape(rows, n))],
        num_keys=1, is_stable=False, dimension=1,
    )
    got = hqs_sums_from_rows(sp, sd, sy, jnp.asarray(fbd), SIZE,
                             interpret=True)
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(got[k]), accs[k].astype(np.uint32)
        )


def test_hqs_sums_from_rows_grouped_equals_single(monkeypatch):
    """SMEM grouping must not change any HQS sum."""
    import pcrhpg24_tpu.render.pallas_merge as pm
    from pcrhpg24_tpu.render import pallas_hqs as ph

    rng = np.random.default_rng(23)
    rows, n = 8, 4096
    pid = rng.integers(0, SIZE, rows * n).astype(np.uint32)
    pid[rng.random(rows * n) < 0.2] = SIZE
    w = (rng.random(rows * n).astype(np.float32) * 50 + 1)
    dep = w.view(np.uint32)
    rgba = rng.integers(0, 2**24, rows * n, dtype=np.uint64).astype(np.uint32)
    fbd = np.full(SIZE, 0xFFFFFFFF, np.uint32)
    np.minimum.at(fbd, pid[pid < SIZE], dep[pid < SIZE])

    sp, sd, sy = jax.lax.sort(
        [jnp.asarray(pid.reshape(rows, n)),
         jnp.asarray(dep.reshape(rows, n)),
         jnp.asarray(rgba.reshape(rows, n))],
        num_keys=1, is_stable=False, dimension=1,
    )
    ref = ph.hqs_sums_from_rows(sp, sd, sy, jnp.asarray(fbd), SIZE,
                                interpret=True)
    ph.hqs_sums_from_rows.clear_cache()
    monkeypatch.setattr(pm, "_SMEM_WORD_BUDGET", 200)
    got = ph.hqs_sums_from_rows(sp, sd, sy, jnp.asarray(fbd), SIZE,
                                interpret=True)
    ph.hqs_sums_from_rows.clear_cache()
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))


def test_hqs_sums_from_rows_matches_scatter_add():
    """The matscatter HQS sum kernel (rows path) == direct per-pixel
    accumulation with the depth-tolerance accept, over multiple
    independently sorted rows incl. heavy collisions and rereads."""
    from pcrhpg24_tpu.render.pallas_hqs import hqs_sums_from_rows

    rng = np.random.default_rng(23)
    S, n = 4, 4096
    pid = rng.integers(0, SIZE, (S, n)).astype(np.uint32)
    pid[rng.random((S, n)) < 0.3] = SIZE
    pid[0, :2048] = 333  # whole-window single run
    w = (rng.random((S, n)).astype(np.float32) * 100 + 1)
    dep = w.view(np.uint32)
    rgba = rng.integers(0, 2**24, (S, n), dtype=np.uint64).astype(np.uint32)

    fbd = np.full(SIZE, 0xFFFFFFFF, np.uint32)
    for s in range(S):
        for i in range(n):
            if pid[s, i] < SIZE:
                fbd[pid[s, i]] = min(fbd[pid[s, i]], dep[s, i])
    accs = np.zeros((4, SIZE), np.uint32)
    old = fbd.view(np.float32)
    for s in range(S):
        for i in range(n):
            p = pid[s, i]
            if p < SIZE and w[s, i] <= old[p] * np.float32(1.01):
                accs[0, p] += rgba[s, i] & 0xFF
                accs[1, p] += (rgba[s, i] >> 8) & 0xFF
                accs[2, p] += (rgba[s, i] >> 16) & 0xFF
                accs[3, p] += 1

    sp, sd, sy = jax.lax.sort(
        [jnp.asarray(pid), jnp.asarray(dep), jnp.asarray(rgba)],
        num_keys=1, is_stable=False, dimension=1,
    )
    got = hqs_sums_from_rows(sp, sd, sy, jnp.asarray(fbd), SIZE,
                             interpret=True)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(got[k]), accs[k])
